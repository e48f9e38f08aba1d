"""HBM-resident dataset path (data/device_resident.py).

Contract under test: staging the full uint8 split on device and gathering
inside the jitted train step is a pure TRANSPORT change — batch order and
step math are identical to the streaming procedural pipeline.
"""

import dataclasses
import os
import tempfile

import numpy as np
import pytest

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.data.device_resident import (
    device_resident_iter,
    stage_on_device,
)
from gvcnn_tf_tpu.data.pipeline import _use_device_resident
from gvcnn_tf_tpu.data.procedural import (
    build_procedural_split,
    procedural_dataset,
)

SPLIT = dict(num_views=2, height=32, width=32, num_shapes=12,
             seed=3, num_classes=10)


def test_iter_order_matches_streaming():
    views, labels = build_procedural_split(train_split=True, hard=False,
                                           **SPLIT)
    stream = procedural_dataset(
        batch_size=4, train=True, num_epochs=2, raw_uint8=True,
        hard=False, **SPLIT)
    resident = device_resident_iter(
        views, labels, batch_size=4, seed=SPLIT["seed"], train=True,
        num_epochs=2)
    n = 0
    for sb, rb in zip(stream, resident, strict=True):
        gathered = np.asarray(rb["views"])[rb["idx"]]
        np.testing.assert_array_equal(sb["views"], gathered)
        np.testing.assert_array_equal(
            sb["label"], np.asarray(rb["label"])[rb["idx"]])
        n += 1
    assert n == 2 * (len(labels) // 4)  # train drops the ragged tail


def test_eval_split_yields_ragged_tail_short():
    views, labels = build_procedural_split(train_split=False, hard=False,
                                           **SPLIT)
    batches = list(device_resident_iter(
        views, labels, batch_size=5, seed=0, train=False, num_epochs=1))
    sizes = [len(b["idx"]) for b in batches]
    assert sum(sizes) == len(labels)
    assert all(s == 5 for s in sizes[:-1])


def test_stage_on_device_chunked(monkeypatch):
    # Force the chunked path without a multi-GB array.
    import gvcnn_tf_tpu.data.device_resident as dr

    monkeypatch.setattr(dr, "_STAGE_CHUNK_BYTES", 1024)
    arr = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
    out = dr.stage_on_device(arr)
    np.testing.assert_array_equal(np.asarray(out), arr)


def _cfg(device_resident: str, logdir: str):
    cfg = get_config("mn10_8view")
    return cfg.replace(
        model="gvcnn",
        name=f"dr_{device_resident}",
        bn_momentum=0.9,
        num_devices=1,  # device-resident is a single-device transport
        data=dataclasses.replace(
            cfg.data,
            dataset="procedural",
            num_classes=10,
            num_views=2,
            height=32,
            width=32,
            batch_size=8,
            synthetic_num_shapes=12,
            transfer_dtype="uint8",
            async_prefetch="off",
            device_resident=device_resident,
        ),
        train=dataclasses.replace(
            cfg.train,
            num_steps=3,
            log_every=1,
            checkpoint_every=0,
            train_logdir=logdir,
            optimizer="adam",
            learning_rate=1e-3,
            seed=7,
        ),
    )


@pytest.mark.slow
def test_train_parity_streaming_vs_resident():
    """Same seeds, same split -> the two transports train identically."""
    import jax

    from gvcnn_tf_tpu.train import train

    outs = {}
    for mode in ("off", "on"):
        with tempfile.TemporaryDirectory() as td:
            state, mets = train(_cfg(mode, os.path.join(td, "t")))
        outs[mode] = (jax.device_get(state.params), mets)
    p_off, p_on = outs["off"][0], outs["on"][0]
    flat_off = jax.tree.leaves(p_off)
    flat_on = jax.tree.leaves(p_on)
    assert len(flat_off) == len(flat_on)
    for a, b in zip(flat_off, flat_on):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-5, atol=2e-6)
    assert np.isfinite(outs["on"][1]["loss"])


def test_auto_gate():
    cfg = _cfg("auto", "/tmp/unused").data
    # 8 virtual devices in the suite -> auto stays off (streaming path).
    assert not _use_device_resident(cfg, train=True)
    # eval never stages
    assert not _use_device_resident(
        dataclasses.replace(cfg, device_resident="on"), train=False)
    # explicit off wins
    assert not _use_device_resident(
        dataclasses.replace(cfg, device_resident="off"), train=True)
    # explicit on forces (single-process here)
    assert _use_device_resident(
        dataclasses.replace(cfg, device_resident="on"), train=True)
