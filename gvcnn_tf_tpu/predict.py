"""Prediction driver (reference predict.py equivalent, SURVEY.md C3/3.3).

Loads V rendered view images for one (or more) shapes from disk, stacks to
(N, V, H, W, 3), runs the forward pass, prints/writes predicted classes.
"""

from __future__ import annotations

import argparse
import csv
import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gvcnn_tf_tpu import metrics as metrics_lib
from gvcnn_tf_tpu.checkpoint import Checkpointer
from gvcnn_tf_tpu.configs import GVCNNConfig, add_flags, config_from_flags
from gvcnn_tf_tpu.models.gvcnn import init_model

_IMG_EXTS = (".jpg", ".jpeg", ".png")


def load_views(
    view_dir: str, num_views: int, height: int, width: int
) -> np.ndarray:
    """Read the V view images of one shape -> (V, H, W, 3) in [-1, 1]."""
    from PIL import Image

    files = sorted(
        os.path.join(view_dir, f)
        for f in os.listdir(view_dir)
        if f.lower().endswith(_IMG_EXTS)
    )
    if len(files) < num_views:
        raise ValueError(
            f"{view_dir} holds {len(files)} views; need {num_views}"
        )
    views = []
    for f in files[:num_views]:
        img = Image.open(f).convert("RGB").resize((width, height))
        views.append(np.asarray(img, np.float32) / 255.0 * 2.0 - 1.0)
    return np.stack(views)


def render_mesh_views(
    mesh_files: Sequence[str], num_views: int, height: int, width: int
) -> np.ndarray:
    """Render V orbit views per OFF/OBJ mesh -> (N, V, H, W, 3) in [-1, 1].

    Uses the same camera orbit as the dataset renderer
    (data/procedural.py::render_views), so checkpoints trained on
    render_meshes output see their native view distribution.
    """
    from gvcnn_tf_tpu.data.procedural import render_views
    from gvcnn_tf_tpu.tools.render_meshes import load_mesh

    assert height == width, "mesh rendering is square"
    out = np.empty((len(mesh_files), num_views, height, width, 3),
                   np.float32)
    for i, path in enumerate(mesh_files):
        verts, faces = load_mesh(path)
        imgs = render_views(verts, faces, num_views, height)
        # Round-trip through uint8 exactly like the dataset renderer
        # (render_meshes.py / procedural.py quantize to PNG bytes before
        # the pipeline rescales to [-1, 1]); feeding continuous floats
        # here would give a <=1/255 train/serve input skew (ADVICE r2).
        q = (imgs * 255).astype(np.uint8).astype(np.float32) / 255.0
        out[i] = np.repeat(q[..., None], 3, axis=-1) * 2.0 - 1.0
    return out


def predict(
    config: GVCNNConfig,
    checkpoint_dir: Optional[str] = None,
    view_dir: Optional[str] = None,
    *,
    views: Optional[np.ndarray] = None,
    mesh_files: Optional[Sequence[str]] = None,
    state=None,
    class_names: Optional[Sequence[str]] = None,
    fold_bn: bool = False,
):
    """Predict classes for shapes.

    One of: `view_dir` (a directory of V images, or a directory of such
    directories), `mesh_files` (raw OFF/OBJ meshes rendered in-process), or
    a ready (N, V, H, W, 3) `views` array.  Returns a list of
    {'shape': str, 'class_index': int, 'probability': float, ...}.
    """
    d = config.data
    names: List[str] = []
    if views is None and mesh_files:
        views = render_mesh_views(
            mesh_files, d.num_views, d.height, d.width
        )
        names = [os.path.splitext(os.path.basename(m))[0]
                 for m in mesh_files]
    elif views is None:
        if view_dir is None:
            raise ValueError("need view_dir, mesh_files, or views")
        subdirs = sorted(
            os.path.join(view_dir, s)
            for s in os.listdir(view_dir)
            if os.path.isdir(os.path.join(view_dir, s))
        )
        dirs = subdirs or [view_dir]
        views = np.stack(
            [load_views(s, d.num_views, d.height, d.width) for s in dirs]
        )
        names = [os.path.basename(s.rstrip("/")) for s in dirs]
    else:
        names = [f"shape_{i}" for i in range(views.shape[0])]

    from gvcnn_tf_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    model, init_vars = init_model(config, jax.random.key(config.train.seed))
    if state is not None:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        ckpt_dir = checkpoint_dir or config.train.train_logdir
        target = {
            "params": init_vars["params"],
            "batch_stats": init_vars.get("batch_stats", {}),
        }
        variables = Checkpointer(ckpt_dir).restore_partial(target)
    if fold_bn:
        from gvcnn_tf_tpu.utils import fold_batch_norm

        variables = fold_batch_norm(variables)

    from gvcnn_tf_tpu.utils import tpu_compiler_options

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def forward(variables, x):
        logits, ep = model.apply(variables, x, train=False)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
        return jnp.argmax(probs, -1), jnp.max(probs, -1), ep.get(
            "view_discrimination_scores"
        )

    pred, prob, scores = forward(variables, jnp.asarray(views))
    results = []
    for i, name in enumerate(names):
        idx = int(pred[i])
        rec = {
            "shape": name,
            "class_index": idx,
            "probability": float(prob[i]),
        }
        if class_names:
            rec["class_name"] = class_names[idx]
        if scores is not None:
            rec["view_scores"] = np.asarray(scores[i]).tolist()
        results.append(rec)
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description="gvcnn_tf_tpu predictor")
    add_flags(p)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--view_dir", default=None,
                   help="dir of V view images, or dir of per-shape dirs")
    p.add_argument("--mesh_file", action="append", default=None,
                   help="raw OFF/OBJ mesh(es) to render and classify "
                        "in-process (repeatable)")
    p.add_argument("--output_csv", default=None)
    p.add_argument("--labels_file", default=None,
                   help="labels.txt from the TFRecord builder")
    p.add_argument("--fold_bn", action="store_true",
                   help="fold BatchNorm into conv kernels (exact)")
    args = p.parse_args(argv)
    config = config_from_flags(args)
    class_names = None
    if args.labels_file:
        class_names = open(args.labels_file).read().splitlines()
    if not args.view_dir and not args.mesh_file:
        p.error("need --view_dir or --mesh_file")
    results = predict(
        config,
        checkpoint_dir=args.checkpoint_dir,
        view_dir=args.view_dir,
        mesh_files=args.mesh_file,
        class_names=class_names,
        fold_bn=args.fold_bn,
    )
    for r in results:
        metrics_lib.log(
            f"{r['shape']}: class {r.get('class_name', r['class_index'])} "
            f"(p={r['probability']:.3f})"
        )
    if args.output_csv:
        with open(args.output_csv, "w", newline="") as f:
            w = csv.DictWriter(
                f, fieldnames=[k for k in results[0] if k != "view_scores"],
                extrasaction="ignore",
            )
            w.writeheader()
            w.writerows(results)


if __name__ == "__main__":
    main()
