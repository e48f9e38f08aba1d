"""Mesh ingestion: OFF/OBJ parsing + render -> TFRecord-ready view trees
(tools/render_meshes.py). End-to-end bridge for raw ModelNet archives."""

import os

import numpy as np
import pytest

from gvcnn_tf_tpu.tools.render_meshes import (
    discover_meshes,
    load_mesh,
    load_obj,
    load_off,
    render_tree,
)

_CUBE_VERTS = [
    (-1, -1, -1), (1, -1, -1), (1, 1, -1), (-1, 1, -1),
    (-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1),
]
# Quads -> exercises fan triangulation.
_CUBE_QUADS = [
    (0, 1, 2, 3), (4, 7, 6, 5), (0, 4, 5, 1),
    (1, 5, 6, 2), (2, 6, 7, 3), (3, 7, 4, 0),
]


def _write_off(path, one_line_header=False):
    with open(path, "w") as f:
        if one_line_header:  # ModelNet's malformed "OFF8 6 0" style
            f.write(f"OFF {len(_CUBE_VERTS)} {len(_CUBE_QUADS)} 0\n")
        else:
            f.write(f"OFF\n{len(_CUBE_VERTS)} {len(_CUBE_QUADS)} 0\n")
        for v in _CUBE_VERTS:
            f.write(" ".join(str(float(x)) for x in v) + "\n")
        for q in _CUBE_QUADS:
            f.write("4 " + " ".join(str(i) for i in q) + "\n")


def _write_obj(path):
    with open(path, "w") as f:
        for v in _CUBE_VERTS:
            f.write("v " + " ".join(str(float(x)) for x in v) + "\n")
        for q in _CUBE_QUADS:
            f.write("f " + " ".join(f"{i + 1}//{i + 1}" for i in q) + "\n")


@pytest.mark.parametrize("one_line", [False, True])
def test_off_parse(tmp_path, one_line):
    p = str(tmp_path / "cube.off")
    _write_off(p, one_line_header=one_line)
    verts, faces = load_off(p)
    assert verts.shape == (8, 3)
    assert faces.shape == (12, 3)  # 6 quads fan-split into 12 tris
    assert faces.min() >= 0 and faces.max() < 8


def test_obj_parse(tmp_path):
    p = str(tmp_path / "cube.obj")
    _write_obj(p)
    verts, faces = load_obj(p)
    assert verts.shape == (8, 3)
    assert faces.shape == (12, 3)


def test_render_tree_builds_tfrecordable_layout(tmp_path):
    mesh_root = tmp_path / "meshes"
    for cls in ("box", "widget"):
        d = mesh_root / cls / "train"
        d.mkdir(parents=True)
        _write_off(str(d / f"{cls}_0001.off"))
    out = str(tmp_path / "views")
    n = render_tree(str(mesh_root), out, split="train", num_views=4, res=32)
    assert n == 2
    # Layout 1 of data/tfrecord.py::discover_shapes:
    # <class>/<shape>/view_##.png
    png = os.path.join(out, "box", "box_0001", "view_00.png")
    assert os.path.exists(png)
    from PIL import Image

    img = np.asarray(Image.open(png))
    assert img.shape == (32, 32, 3)
    assert img.min() < 250  # the cube actually rasterized (not all white)

    # The TFRecord builder consumes the tree directly.
    from gvcnn_tf_tpu.data.tfrecord import discover_shapes

    shapes, classes = discover_shapes(out)
    assert classes == ["box", "widget"]
    assert len(shapes) == 2 and len(shapes[0][2]) == 4


def test_discover_meshes_flat_layout(tmp_path):
    d = tmp_path / "cls_a"
    d.mkdir()
    _write_off(str(d / "m1.off"))
    found = discover_meshes(str(tmp_path), "train")
    assert len(found) == 1 and found[0][0] == "cls_a"
    verts, faces = load_mesh(found[0][2])
    assert len(verts) == 8 and len(faces) == 12


def test_predict_from_mesh_file(tmp_path):
    """predict --mesh_file: raw OFF -> in-process render -> classification."""
    import dataclasses

    import jax

    from gvcnn_tf_tpu.configs import get_config
    from gvcnn_tf_tpu.models.gvcnn import init_model
    from gvcnn_tf_tpu.predict import predict
    from gvcnn_tf_tpu.train import create_train_state

    p = str(tmp_path / "cube.off")
    _write_off(p)
    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        compute_dtype="float32",
        data=dataclasses.replace(
            cfg.data, height=32, width=32, num_views=2,
        ),
    )
    _, _, state = create_train_state(cfg, jax.random.key(0),
                                     input_shape=(1, 2, 32, 32, 3))
    out = predict(cfg, mesh_files=[p], state=state)
    assert len(out) == 1
    assert out[0]["shape"] == "cube"
    assert 0 <= out[0]["class_index"] < 10
    assert len(out[0]["view_scores"]) == 2
