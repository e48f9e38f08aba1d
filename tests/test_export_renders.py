"""export_renders: procedural split -> JPEG tree -> real file loaders.

The bridge must produce a tree that `discover_shapes` parses with the
SAME labels the procedural split used, and that the decode-once memmap
loader consumes end to end (the flagship-scale loader measurement path,
VERDICT r4 Next #4).
"""

import json

import numpy as np
import pytest

from gvcnn_tf_tpu.tools.export_renders import export_tree


@pytest.fixture(scope="module")
def tiny_tree(tmp_path_factory):
    out = tmp_path_factory.mktemp("renders")
    report = export_tree(
        str(out), num_classes=10, num_views=2, height=16, width=16,
        num_shapes=6, seed=0)
    return out, report


def test_export_tree_layout(tiny_tree):
    out, report = tiny_tree
    assert report["shapes"] == 6 and report["views"] == 12
    from gvcnn_tf_tpu.data.tfrecord import discover_shapes

    from gvcnn_tf_tpu.data.procedural import build_procedural_split

    shapes, classes = discover_shapes(str(out))
    assert len(shapes) == 6
    assert all(len(v) == 2 for _, _, v in shapes)
    # Labels survive the round trip: the exported tree's class dirs map
    # every shape back to the label the procedural split assigned it.
    _, labels = build_procedural_split(
        num_views=2, height=16, width=16, num_shapes=6, seed=0,
        train_split=True, num_classes=10)
    by_idx = {}
    for sid, lbl, _ in shapes:
        idx = int(sid.rsplit("_", 1)[1])
        by_idx[idx] = classes[lbl]
    from gvcnn_tf_tpu.data.procedural import class_table

    names = [n for n, _ in class_table(10)]
    for idx, cls in by_idx.items():
        assert cls == names[int(labels[idx])], (idx, cls)


def test_export_tree_idempotent(tiny_tree):
    out, report = tiny_tree
    again = export_tree(
        str(out), num_classes=10, num_views=2, height=16, width=16,
        num_shapes=6, seed=0)
    assert again["jpeg_bytes"] == report["jpeg_bytes"]


def test_decoded_loader_over_exported_tree(tiny_tree):
    out, _ = tiny_tree
    from gvcnn_tf_tpu.data.decoded_cache import decoded_dataset

    it = decoded_dataset(
        str(out), num_views=2, height=16, width=16, batch_size=3,
        train=False, num_epochs=1, raw_uint8=True)
    batches = list(it)
    assert len(batches) == 2
    v = batches[0]["views"]
    assert v.shape == (3, 2, 16, 16, 3) and v.dtype == np.uint8
    # JPEG round trip is lossy but the renders are flat-shaded: decoded
    # pixels must stay close to the source render.  Eval streams in
    # discover_shapes order (sorted by class dir, then shape id) — NOT
    # export index order — so re-sort the source split the same way.
    from gvcnn_tf_tpu.data.procedural import (build_procedural_split,
                                              class_table)

    views, labels = build_procedural_split(
        num_views=2, height=16, width=16, num_shapes=6, seed=0,
        train_split=True, num_classes=10)
    names = [n for n, _ in class_table(10)]
    order = sorted(range(len(views)),
                   key=lambda i: (names[int(labels[i])], i))
    got = np.concatenate([b["views"] for b in batches]).astype(np.float32)
    want = views[order].astype(np.float32)
    assert np.mean(np.abs(got - want)) < 8.0


def test_cli_main(tmp_path, capsys):
    from gvcnn_tf_tpu.tools.export_renders import main

    report = main(["--out", str(tmp_path / "t"), "--num_classes", "10",
                   "--num_views", "2", "--height", "16",
                   "--num_shapes", "4", "--quality", "85"])
    printed = json.loads(capsys.readouterr().out)
    assert printed == report
    assert report["shapes"] == 4
