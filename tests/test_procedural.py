"""Procedural multi-view benchmark tests (data/procedural.py)."""

import numpy as np

import pytest

from gvcnn_tf_tpu.data.procedural import (
    CLASSES,
    CLASSES40,
    build_procedural_split,
    class_names,
    class_table,
    procedural_dataset,
    render_views,
)


def test_every_class_renders_foreground():
    rng = np.random.RandomState(0)
    for name, builder in CLASSES:
        verts, faces = builder(rng)
        imgs = render_views(verts, faces, num_views=4, res=32)
        assert imgs.shape == (4, 32, 32)
        fg = (imgs < 0.99).mean(axis=(1, 2))       # non-background pixels
        assert (fg > 0.02).all(), f"{name}: empty render {fg}"
        assert imgs.min() >= 0.0 and imgs.max() <= 1.0


def test_views_are_views_of_one_object():
    """Different azimuths of one instance differ, but re-rendering the same
    instance is bit-identical (deterministic geometry + cameras)."""
    _, builder = CLASSES[5]                         # chair: asymmetric
    verts, faces = builder(np.random.RandomState(3))
    a = render_views(verts, faces, num_views=6, res=32)
    b = render_views(verts, faces, num_views=6, res=32)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a[0] - a[2]).mean() > 0.003       # azimuths differ


def test_split_build_and_determinism():
    kw = dict(num_views=4, height=32, width=32, num_shapes=10, seed=1)
    v1, l1 = build_procedural_split(train_split=True, **kw)
    v2, l2 = build_procedural_split(train_split=True, **kw)
    assert v1.shape == (10, 4, 32, 32, 3) and v1.dtype == np.uint8
    np.testing.assert_array_equal(v1, v2)           # lru-cached + seeded
    np.testing.assert_array_equal(l1, np.arange(10) % len(CLASSES))
    # Validation split draws different instances of the same classes.
    v3, _ = build_procedural_split(train_split=False, **kw)
    assert np.abs(v1.astype(int) - v3.astype(int)).mean() > 0.5


def test_iterator_contract_and_ragged_tail():
    kw = dict(num_classes=len(CLASSES), num_views=2, height=32, width=32,
              batch_size=4, num_shapes=10, seed=0, num_epochs=1)
    eval_sizes = [len(b["label"]) for b in
                  procedural_dataset(train=False, **kw)]
    assert eval_sizes == [4, 4, 2]
    b = next(iter(procedural_dataset(train=True, **kw)))
    assert b["views"].shape == (4, 2, 32, 32, 3)
    assert b["views"].dtype == np.float32
    assert b["views"].min() >= -1.0 and b["views"].max() <= 1.0
    assert len(class_names()) == len(CLASSES)


def test_40_class_table_renders_and_extends_10():
    """CLASSES40 = CLASSES + 30 new families; every builder renders real
    foreground from every camera (flagship dress-rehearsal set, VERDICT r3
    Next #2)."""
    assert CLASSES40[: len(CLASSES)] == CLASSES      # 10-class prefix intact
    assert len(CLASSES40) == 40
    names = [n for n, _ in CLASSES40]
    assert len(set(names)) == 40                     # no duplicate names
    for name, builder in CLASSES40[len(CLASSES):]:
        verts, faces = builder(np.random.RandomState(1))
        imgs = render_views(verts, faces, num_views=4, res=32)
        fg = (imgs < 0.99).mean(axis=(1, 2))
        assert (fg > 0.005).all(), f"{name}: empty render {fg}"
        assert (fg < 0.95).all(), f"{name}: fills frame {fg}"


def test_class_table_selection():
    assert class_table(10) is CLASSES
    assert class_table(40) is CLASSES40
    assert len(class_names(40)) == 40
    with pytest.raises(ValueError):
        class_table(25)


def test_40_class_split_labels_and_10_class_bytes_unchanged():
    kw = dict(num_views=2, height=32, width=32, num_shapes=12, seed=2,
              train_split=True)
    v40, l40 = build_procedural_split(num_classes=40, **kw)
    np.testing.assert_array_equal(l40, np.arange(12) % 40)
    # The first 10 labels map to the same builders AND the same per-instance
    # rng stream as the 10-class table -> identical pixels for those shapes.
    v10, l10 = build_procedural_split(num_classes=10, **kw)
    np.testing.assert_array_equal(v40[:10], v10[:10])
    # Shapes 10, 11 are new classes in the 40-class table.
    assert (v40[10] != v10[10]).any()


def test_40_class_dataset_iterator():
    b = next(iter(procedural_dataset(
        num_classes=40, num_views=2, height=32, width=32, batch_size=4,
        num_shapes=8, seed=0, train=True, num_epochs=1)))
    assert b["views"].shape == (4, 2, 32, 32, 3)
    assert b["label"].max() < 40


def test_disk_render_cache_roundtrip(tmp_path, monkeypatch):
    """GVCNN_PROC_CACHE: second build of the same split loads the cached
    renders byte-identically; different args get different cache entries."""
    monkeypatch.setenv("GVCNN_PROC_CACHE", str(tmp_path))
    kw = dict(num_views=2, height=24, width=24, num_shapes=6, seed=5,
              train_split=True)
    v1, l1 = build_procedural_split.__wrapped__(**kw)
    files = list(tmp_path.glob("proc_*.npz"))
    assert len(files) == 1
    v2, l2 = build_procedural_split.__wrapped__(**kw)   # cache hit
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(l1, l2)
    build_procedural_split.__wrapped__(**{**kw, "seed": 6})
    assert len(list(tmp_path.glob("proc_*.npz"))) == 2


def test_topdown_views_are_less_discriminative():
    """The every-4th near-top-down view: box vs tallbox silhouettes are
    much closer top-down than side-on (the signal GVCNN's grouping can
    exploit and MVCNN cannot)."""
    rng = np.random.RandomState(0)
    vb, fb = CLASSES[0][1](rng)                     # box
    rng2 = np.random.RandomState(0)
    vt, ft = CLASSES[1][1](rng2)                    # tallbox
    a = render_views(vb, fb, num_views=4, res=48)
    b = render_views(vt, ft, num_views=4, res=48)
    side = np.abs(a[0] - b[0]).mean()               # 30 deg elevation
    top = np.abs(a[3] - b[3]).mean()                # 75 deg elevation
    assert top < side, (top, side)


def test_hard_mode_clutters_topdown_views_only():
    from gvcnn_tf_tpu.data.procedural import build_procedural_split

    easy, _ = build_procedural_split(
        num_views=4, height=32, width=32, num_shapes=2, seed=3,
        train_split=True,
    )
    hard, _ = build_procedural_split(
        num_views=4, height=32, width=32, num_shapes=2, seed=3,
        train_split=True, hard=True,
    )
    assert easy.shape == hard.shape
    # Even-index views: same 30-degree orbit cameras, no clutter -> equal.
    import numpy as np

    np.testing.assert_array_equal(hard[:, 0], easy[:, 0])
    np.testing.assert_array_equal(hard[:, 2], easy[:, 2])
    # Odd-index views differ (85 vs 30/75 deg cameras + occluders).
    assert (hard[:, 1] != easy[:, 1]).mean() > 0.05
