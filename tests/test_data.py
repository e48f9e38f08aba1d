"""Input-pipeline tests: synthetic stream, TFRecord round-trip, prefetch."""

import os

import numpy as np
import pytest

from gvcnn_tf_tpu.configs import DataConfig
from gvcnn_tf_tpu.data import make_dataset, prefetch_to_device
from gvcnn_tf_tpu.data.synthetic import synthetic_dataset


def test_synthetic_shapes_and_determinism():
    kw = dict(num_classes=10, num_views=4, height=16, width=16,
              batch_size=4, num_shapes=16, seed=7, num_epochs=1)
    a = list(synthetic_dataset(**kw))
    b = list(synthetic_dataset(**kw))
    assert len(a) == 4
    assert a[0]["views"].shape == (4, 4, 16, 16, 3)
    assert a[0]["label"].shape == (4,)
    assert a[0]["views"].dtype == np.float32
    assert (np.abs(a[0]["views"]) <= 1.0).all()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["views"], y["views"])
        np.testing.assert_array_equal(x["label"], y["label"])


def test_synthetic_class_conditional():
    """Same label -> similar views across epochs (prototype + noise)."""
    it = synthetic_dataset(num_classes=3, num_views=2, height=8, width=8,
                           batch_size=2, num_shapes=8, seed=0, train=False,
                           num_epochs=2, noise=0.0)
    batches = list(it)
    half = len(batches) // 2
    for b1, b2 in zip(batches[:half], batches[half:]):
        np.testing.assert_array_equal(b1["views"], b2["views"])


def test_synthetic_eval_yields_ragged_tail():
    """Eval streams must cover the FULL split: 10 shapes / batch 4 ->
    batches of 4, 4, 2 (train still drops the tail; it repeats anyway)."""
    kw = dict(num_classes=3, num_views=2, height=8, width=8, batch_size=4,
              num_shapes=10, seed=0, num_epochs=1)
    sizes = [len(b["label"]) for b in synthetic_dataset(train=False, **kw)]
    assert sizes == [4, 4, 2]
    sizes_tr = [len(b["label"]) for b in synthetic_dataset(train=True, **kw)]
    assert sizes_tr == [4, 4]


def test_make_dataset_synthetic_fallback():
    cfg = DataConfig(dataset="synthetic", num_classes=5, num_views=3,
                     height=8, width=8, batch_size=2, synthetic_num_shapes=8)
    it = make_dataset(cfg, train=True, num_epochs=1)
    batch = next(it)
    assert batch["views"].shape == (2, 3, 8, 8, 3)


def test_prefetch_to_device_preserves_order():
    cfg = DataConfig(dataset="synthetic", num_classes=5, num_views=2,
                     height=8, width=8, batch_size=2, synthetic_num_shapes=8)
    host = list(make_dataset(cfg, train=False, num_epochs=1))
    dev = list(prefetch_to_device(iter(host), size=2))
    assert len(dev) == len(host)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h["label"], np.asarray(d["label"]))


@pytest.mark.filterwarnings("ignore")
def test_tfrecord_roundtrip(tmp_path):
    """Builder -> reader round-trip on a tiny generated image tree."""
    tf = pytest.importorskip("tensorflow")
    from PIL import Image

    from gvcnn_tf_tpu.data.tfrecord import build_tfrecords, tfrecord_dataset

    root = tmp_path / "imgs"
    V = 3
    rng = np.random.RandomState(0)
    for cls in ["airplane", "chair"]:
        for s in range(2):
            d = root / cls / f"{cls}_{s:04d}"
            d.mkdir(parents=True)
            for v in range(V):
                arr = rng.randint(0, 255, (32, 32, 3), np.uint8)
                Image.fromarray(arr).save(d / f"view_{v:02d}.png")

    out = tmp_path / "tfr"
    paths = build_tfrecords(str(root), str(out), V, split_name="train",
                            num_shards=2)
    assert len(paths) == 2
    assert (out / "labels.txt").read_text().splitlines() == [
        "airplane", "chair"
    ]

    batches = list(
        tfrecord_dataset(
            [str(p) for p in paths], num_views=V, height=16, width=16,
            batch_size=2, train=False, drop_remainder=False,
        )
    )
    total = sum(b["label"].shape[0] for b in batches)
    assert total == 4
    b = batches[0]
    assert b["views"].shape == (2, V, 16, 16, 3)
    assert b["views"].min() >= -1.0 and b["views"].max() <= 1.0
    assert set(np.concatenate([x["label"] for x in batches])) <= {0, 1}


@pytest.mark.filterwarnings("ignore")
def test_tfrecord_raw_uint8(tmp_path):
    """raw_uint8: same eval geometry, uint8 wire values within 0.5 level of
    the float path after re-normalization."""
    pytest.importorskip("tensorflow")
    from PIL import Image

    from gvcnn_tf_tpu.data.tfrecord import build_tfrecords, tfrecord_dataset

    root = tmp_path / "imgs"
    rng = np.random.RandomState(3)
    d = root / "chair" / "chair_0000"
    d.mkdir(parents=True)
    for v in range(2):
        Image.fromarray(rng.randint(0, 255, (24, 24, 3), np.uint8)).save(
            d / f"view_{v:02d}.png")
    paths = build_tfrecords(str(root), str(tmp_path / "tfr"), 2,
                            split_name="train", num_shards=1)
    kw = dict(num_views=2, height=16, width=16, batch_size=1, train=False,
              drop_remainder=False)
    raw = next(iter(tfrecord_dataset(paths, raw_uint8=True, **kw)))
    ref = next(iter(tfrecord_dataset(paths, **kw)))
    assert raw["views"].dtype == np.uint8
    renorm = raw["views"].astype(np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_allclose(renorm, ref["views"], atol=1.01 / 255.0)


def test_prefetch_bf16_transfer():
    import jax.numpy as jnp
    from gvcnn_tf_tpu.data.prefetch import prefetch_to_device

    cfg = DataConfig(dataset="synthetic", num_classes=3, num_views=2,
                     height=8, width=8, batch_size=2, synthetic_num_shapes=4)
    host = list(make_dataset(cfg, train=False, num_epochs=1))
    dev = list(prefetch_to_device(iter(host), size=2,
                                  transfer_dtype="bfloat16"))
    assert dev[0]["views"].dtype == jnp.bfloat16
    assert dev[0]["label"].dtype == host[0]["label"].dtype  # ints untouched
    np.testing.assert_allclose(
        np.asarray(dev[0]["views"], np.float32), host[0]["views"],
        atol=0.01,  # bf16 quantization
    )


def test_prefetch_async_preserves_order_and_terminates():
    from gvcnn_tf_tpu.data.prefetch import prefetch_to_device_async

    cfg = DataConfig(dataset="synthetic", num_classes=5, num_views=2,
                     height=8, width=8, batch_size=2, synthetic_num_shapes=8)
    host = list(make_dataset(cfg, train=False, num_epochs=1))
    dev = list(prefetch_to_device_async(iter(host), size=2))
    assert len(dev) == len(host)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h["label"], np.asarray(d["label"]))

    # Early consumer exit must not deadlock the producer.
    it = prefetch_to_device_async(iter(host), size=1)
    next(it)
    it.close()


def test_prefetch_async_propagates_producer_errors():
    """An input-pipeline crash must surface to the consumer, not read as
    clean exhaustion (ADVICE r1: train() would log 'dataset exhausted' and
    exit as success mid-run)."""
    from gvcnn_tf_tpu.data.prefetch import prefetch_to_device_async

    def broken():
        yield {"label": np.zeros(2, np.int32)}
        raise RuntimeError("decode failed")

    it = prefetch_to_device_async(broken(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


@pytest.mark.filterwarnings("ignore")
def test_slim_preprocessing_eval_golden(tmp_path):
    """slim eval geometry: central_crop(crop_fraction) of the ORIGINAL
    image, THEN resize — checked against an independently computed crop on
    a non-square source (where the square mode's resize-then-crop gives a
    different answer)."""
    tf = pytest.importorskip("tensorflow")
    from PIL import Image

    from gvcnn_tf_tpu.data.tfrecord import build_tfrecords, tfrecord_dataset

    rng = np.random.RandomState(3)
    src = rng.randint(0, 255, (40, 80, 3), np.uint8)  # non-square H=40 W=80
    root = tmp_path / "imgs"
    d = root / "chair" / "chair_0000"
    d.mkdir(parents=True)
    Image.fromarray(src).save(d / "view_00.png")
    paths = build_tfrecords(str(root), str(tmp_path / "tfr"), 1,
                            split_name="validation", num_shards=1)

    kw = dict(num_views=1, height=16, width=16, batch_size=1, train=False,
              drop_remainder=False, crop_fraction=0.5)
    got_slim = next(iter(tfrecord_dataset(paths, preprocessing="slim", **kw)))
    got_square = next(iter(tfrecord_dataset(paths, preprocessing="square", **kw)))

    # Independent expectation: crop the central 50% of each dim of the
    # ORIGINAL image (offsets floor((1-f)/2*dim), TF central_crop geometry),
    # then the same bilinear resize.
    f = 0.5
    oh, ow = int((40 - 40 * f) / 2), int((80 - 80 * f) / 2)
    crop = src[oh:oh + int(40 * f), ow:ow + int(80 * f)]
    exp = tf.image.resize(
        tf.cast(crop, tf.float32) / 255.0, (16, 16), antialias=False
    ).numpy() * 2.0 - 1.0
    np.testing.assert_allclose(got_slim["views"][0, 0], exp, atol=1e-5)
    # And the two families genuinely differ on a non-square source.
    assert np.abs(got_slim["views"] - got_square["views"]).max() > 0.05


@pytest.mark.filterwarnings("ignore")
def test_slim_preprocessing_train_shapes(tmp_path):
    """slim train path (distorted crop) produces valid static shapes."""
    pytest.importorskip("tensorflow")
    from PIL import Image

    from gvcnn_tf_tpu.data.tfrecord import build_tfrecords, tfrecord_dataset

    rng = np.random.RandomState(4)
    root = tmp_path / "imgs"
    for s in range(2):
        d = root / "chair" / f"chair_{s:04d}"
        d.mkdir(parents=True)
        for v in range(2):
            Image.fromarray(
                rng.randint(0, 255, (48, 48, 3), np.uint8)
            ).save(d / f"view_{v:02d}.png")
    paths = build_tfrecords(str(root), str(tmp_path / "tfr"), 2,
                            split_name="train", num_shards=1)
    it = tfrecord_dataset(paths, num_views=2, height=16, width=16,
                          batch_size=2, train=True, preprocessing="slim")
    b = next(iter(it))
    assert b["views"].shape == (2, 2, 16, 16, 3)
    assert b["views"].min() >= -1.0 and b["views"].max() <= 1.0
