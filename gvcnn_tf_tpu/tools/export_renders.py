"""Export a procedural split as a JPEG view tree for the file loaders.

The procedural benchmark keeps its renders in npz arrays (fast for the
in-memory loader), but the production input path — TFRecord, the C++
native decode pool, and the decode-once memmap cache — consumes an image
TREE (reference data layout: modelnet "<class>/<shape>/<view>.jpg",
SURVEY.md C5/C7).  This tool bridges the two so flagship-scale loader
measurements (VERDICT r4 Next #4: "one decoded-loader epoch at flagship
scale") run against the same 1200-shape 224^2/12-view split the dress
rehearsal trains on, through the REAL decode chain:

    python -m gvcnn_tf_tpu.tools.export_renders \
        --out /tmp/flagship_tree --num_classes 40 --num_views 12 \
        --height 224 --num_shapes 1200 [--eval] [--hard] [--quality 90]

Layout written (discover_shapes layout 1, data/tfrecord.py:39):

    <out>/<class_name>/<class>_NNNN/view_NN.jpg

Renders come from `build_procedural_split`, so a pre-rendered
GVCNN_PROC_CACHE npz is reused instead of re-rasterizing (~10 min saved
at flagship scale).  Deterministic in (seed, split, geometry) — the tree
is reproducible bit-for-bit modulo JPEG encoder version.

Prints one JSON line: tree root, shapes, views, bytes written.
"""

from __future__ import annotations

import argparse
import json
import os


def export_tree(
    out: str,
    *,
    num_classes: int,
    num_views: int,
    height: int,
    width: int,
    num_shapes: int,
    seed: int = 0,
    train_split: bool = True,
    hard: bool = False,
    quality: int = 90,
) -> dict:
    from PIL import Image

    from gvcnn_tf_tpu.data.procedural import (build_procedural_split,
                                              class_table)

    views, labels = build_procedural_split(
        num_views=num_views, height=height, width=width,
        num_shapes=num_shapes, seed=seed, train_split=train_split,
        hard=hard, num_classes=num_classes)
    names = [n for n, _ in class_table(num_classes)]
    total_bytes = 0
    n_views = 0
    for i in range(len(views)):
        cls = names[int(labels[i])]
        sdir = os.path.join(out, cls, f"{cls}_{i:04d}")
        os.makedirs(sdir, exist_ok=True)
        for v in range(views.shape[1]):
            path = os.path.join(sdir, f"view_{v:02d}.jpg")
            if not os.path.exists(path):
                Image.fromarray(views[i, v]).save(
                    path, "JPEG", quality=quality)
            total_bytes += os.path.getsize(path)
            n_views += 1
    return {
        "out": out,
        "shapes": int(len(views)),
        "views": n_views,
        "classes": len(names),
        "geometry": [int(x) for x in views.shape[1:]],
        "jpeg_bytes": total_bytes,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--num_classes", type=int, default=40)
    p.add_argument("--num_views", type=int, default=12)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--num_shapes", type=int, default=1200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval", action="store_true",
                   help="export the eval split (disjoint instances)")
    p.add_argument("--hard", action="store_true")
    p.add_argument("--quality", type=int, default=90)
    args = p.parse_args(argv)
    report = export_tree(
        args.out, num_classes=args.num_classes, num_views=args.num_views,
        height=args.height, width=args.height, num_shapes=args.num_shapes,
        seed=args.seed, train_split=not getattr(args, "eval"),
        hard=args.hard, quality=args.quality)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
