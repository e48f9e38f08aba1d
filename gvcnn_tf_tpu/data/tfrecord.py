"""TFRecord schema, offline builder, and tf.data reader for multi-view shapes.

Mirrors the reference's pipeline (SURVEY.md C5: per-shape record holding V
encoded images + label; C7: offline converter from a rendered-view directory
tree).  TensorFlow is used ONLY here, host-side, for TFRecord IO and JPEG
decode (SURVEY.md section 7: "TF 2.21 for tf.data/TFRecord only") — nothing
TF touches the device; batches cross to JAX as NumPy.

Record schema (keys follow the reference's `image/...` style [MED]):
  image/encoded  : bytes_list, V encoded JPEG/PNG views
  image/format   : bytes       ('jpeg' | 'png')
  image/class/label : int64
  shape/id       : bytes       (shape identifier, e.g. 'chair_0001')

Directory layouts accepted by the builder (ModelNet MVCNN-style renders):
  root/<class>/<shape_id>/<view>.png          (one dir per shape)
  root/<class>/<shape>_v01.png ...            (flat, grouped by stem prefix)
"""

from __future__ import annotations

import os
import re
from typing import Dict, Iterator, List, Sequence, Tuple



def _tf():
    import tensorflow as tf  # local import: host-side IO only

    tf.config.set_visible_devices([], "GPU")
    return tf


_VIEW_SUFFIX = re.compile(r"[._-]v?(\d+)$")
_IMG_EXTS = (".jpg", ".jpeg", ".png")


def discover_shapes(root: str) -> Tuple[List[Tuple[str, int, List[str]]], List[str]]:
    """Walk a rendered-view tree -> ([(shape_id, label, [view paths])], classes)."""
    # Hidden directories are never classes — the decoded-view cache lives
    # at <root>/.gvcnn_decoded and counting it would shift every label.
    classes = sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and not d.startswith(".")
    )
    shapes: List[Tuple[str, int, List[str]]] = []
    for label, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        subdirs = sorted(
            d for d in os.listdir(cdir)
            if os.path.isdir(os.path.join(cdir, d)) and not d.startswith(".")
        )
        if subdirs:  # layout 1: one dir per shape
            for sid in subdirs:
                views = sorted(
                    os.path.join(cdir, sid, f)
                    for f in os.listdir(os.path.join(cdir, sid))
                    if f.lower().endswith(_IMG_EXTS)
                )
                if views:
                    shapes.append((f"{cls}/{sid}", label, views))
        else:  # layout 2: flat files grouped by stem prefix
            groups: Dict[str, List[str]] = {}
            for f in sorted(os.listdir(cdir)):
                if not f.lower().endswith(_IMG_EXTS):
                    continue
                stem = os.path.splitext(f)[0]
                key = _VIEW_SUFFIX.sub("", stem)
                groups.setdefault(key, []).append(os.path.join(cdir, f))
            for sid, views in sorted(groups.items()):
                shapes.append((f"{cls}/{sid}", label, sorted(views)))
    return shapes, classes


def build_tfrecords(
    image_root: str,
    output_dir: str,
    num_views: int,
    *,
    split_name: str = "train",
    num_shards: int = 4,
) -> List[str]:
    """Offline converter (reference C7 parity): image tree -> sharded TFRecords.

    Shapes with fewer than `num_views` views are dropped; extras truncated
    (the reference assumes exactly V renders per shape [MED]).
    """
    tf = _tf()
    shapes, classes = discover_shapes(image_root)
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "labels.txt"), "w") as f:
        f.write("\n".join(classes))

    paths = [
        os.path.join(
            output_dir, f"{split_name}-{i:05d}-of-{num_shards:05d}.tfrecord"
        )
        for i in range(num_shards)
    ]
    writers = [tf.io.TFRecordWriter(p) for p in paths]
    written = 0
    try:
        for i, (sid, label, views) in enumerate(shapes):
            if len(views) < num_views:
                continue
            views = views[:num_views]
            encoded = [open(v, "rb").read() for v in views]
            fmt = b"png" if views[0].lower().endswith(".png") else b"jpeg"
            ex = tf.train.Example(
                features=tf.train.Features(
                    feature={
                        "image/encoded": tf.train.Feature(
                            bytes_list=tf.train.BytesList(value=encoded)
                        ),
                        "image/format": tf.train.Feature(
                            bytes_list=tf.train.BytesList(value=[fmt])
                        ),
                        "image/class/label": tf.train.Feature(
                            int64_list=tf.train.Int64List(value=[label])
                        ),
                        "shape/id": tf.train.Feature(
                            bytes_list=tf.train.BytesList(
                                value=[sid.encode()]
                            )
                        ),
                    }
                )
            )
            writers[i % num_shards].write(ex.SerializeToString())
            written += 1
    finally:
        for w in writers:
            w.close()
    if written == 0:
        raise ValueError(
            f"no shapes with >= {num_views} views found under {image_root}"
        )
    return paths


def tfrecord_dataset(
    file_pattern: Sequence[str] | str,
    *,
    num_views: int,
    height: int,
    width: int,
    batch_size: int,
    train: bool,
    augment: bool = True,
    shuffle_buffer: int = 1024,
    crop_fraction: float = 0.875,
    seed: int = 0,
    drop_remainder: bool = True,
    preprocessing: str = "square",
    shard_index: int = 0,
    num_shards: int = 1,
    raw_uint8: bool = False,
) -> Iterator[dict]:
    """tf.data reader -> NumPy iterator of {'views': (B,V,H,W,3), 'label': (B,)}.

    Two preprocessing families (DataConfig.preprocessing):
      * "square" — decode -> resize to H/crop_fraction -> (train: random
        crop + per-view random horizontal flip | eval: central crop) ->
        scale to [-1, 1].  Round-1 behavior, deterministic eval geometry.
      * "slim"   — TF-Slim inception_preprocessing semantics (the reference
        family's preprocessing, SURVEY.md C5 [MED]): eval = central_crop of
        `crop_fraction` THEN bilinear resize to HxW; train = slim's
        distorted bounding-box crop (area 5-100%, aspect 3/4-4/3) -> resize
        -> random flip.  Matches what slim ImageNet checkpoints were trained
        on, so warm-started backbones see their native input distribution.

    `raw_uint8=True` emits views as uint8 [0, 255] (rounded after the float
    preprocessing geometry — crops/resizes are unchanged) for
    `transfer_dtype="uint8"` runs: 4x less H2D, normalization on device
    (utils/images.py), <= 0.5/255 quantization vs the float path.
    """
    tf = _tf()
    if preprocessing not in ("square", "slim"):
        raise ValueError(f"unknown preprocessing {preprocessing!r}")

    def parse(serialized):
        feats = tf.io.parse_single_example(
            serialized,
            {
                "image/encoded": tf.io.FixedLenFeature([num_views], tf.string),
                "image/class/label": tf.io.FixedLenFeature([], tf.int64),
            },
        )

        big_h = int(height / crop_fraction)
        big_w = int(width / crop_fraction)

        def decode_square(img):
            if train and augment:
                img = tf.image.resize(img, (big_h, big_w), antialias=True)
                img = tf.image.random_crop(img, (height, width, 3))
                img = tf.image.random_flip_left_right(img)
            else:
                img = tf.image.resize(img, (big_h, big_w), antialias=True)
                off_h, off_w = (big_h - height) // 2, (big_w - width) // 2
                img = tf.image.crop_to_bounding_box(
                    img, off_h, off_w, height, width
                )
            return img

        def decode_slim(img):
            # slim inception_preprocessing: preprocess_for_train /
            # preprocess_for_eval (tensorflow/models/research/slim).
            if train and augment:
                bbox = tf.zeros([1, 0, 4], tf.float32)  # whole image
                begin, size, _ = tf.image.sample_distorted_bounding_box(
                    tf.shape(img),
                    bounding_boxes=bbox,
                    min_object_covered=0.1,
                    aspect_ratio_range=(0.75, 1.333),
                    area_range=(0.05, 1.0),
                    max_attempts=100,
                    use_image_if_no_bounding_boxes=True,
                )
                img = tf.slice(img, begin, size)
                img = tf.image.resize(img, (height, width), antialias=False)
                img = tf.image.random_flip_left_right(img)
            else:
                img = tf.image.central_crop(img, central_fraction=crop_fraction)
                img = tf.image.resize(img, (height, width), antialias=False)
            return img

        def decode_one(enc):
            img = tf.io.decode_image(enc, channels=3, expand_animations=False)
            img = tf.cast(img, tf.float32) / 255.0
            img = decode_slim(img) if preprocessing == "slim" else decode_square(img)
            img = tf.ensure_shape(img, (height, width, 3))
            if raw_uint8:
                return tf.cast(
                    tf.clip_by_value(tf.round(img * 255.0), 0.0, 255.0),
                    tf.uint8)
            return img * 2.0 - 1.0

        views = tf.map_fn(
            decode_one, feats["image/encoded"],
            fn_output_signature=tf.uint8 if raw_uint8 else tf.float32,
        )
        views = tf.ensure_shape(views, (num_views, height, width, 3))
        return {"views": views, "label": tf.cast(feats["image/class/label"], tf.int32)}

    files = (
        tf.data.Dataset.list_files(file_pattern, shuffle=train, seed=seed)
        if isinstance(file_pattern, str)
        else tf.data.Dataset.from_tensor_slices(list(file_pattern))
    )
    ds = files.interleave(
        tf.data.TFRecordDataset,
        cycle_length=tf.data.AUTOTUNE,
        num_parallel_calls=tf.data.AUTOTUNE,
    )
    if num_shards > 1:
        # Multi-host: each process reads a disjoint record subset.  Sharding
        # at the record level (not the file level) stays correct when the
        # split has fewer files than processes.
        ds = ds.shard(num_shards, shard_index)
    if train:
        ds = ds.shuffle(shuffle_buffer, seed=seed).repeat()
    ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_size, drop_remainder=drop_remainder)
    ds = ds.prefetch(tf.data.AUTOTUNE)
    for batch in ds.as_numpy_iterator():
        yield batch
