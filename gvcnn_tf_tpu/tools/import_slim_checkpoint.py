"""Import a TF-Slim Inception-v1 checkpoint into gvcnn_tf_tpu params.

The reference warm-starts its backbone from the public slim ImageNet
checkpoint via `slim.assign_from_checkpoint_fn` (SURVEY.md C8).  Our Flax
backbone keeps slim's scope names (models/backbones/inception_v1.py), so the
import is a pure renaming:

    slim variable                                  flax path
    InceptionV1/Conv2d_1a_7x7/weights           -> InceptionV1/Conv2d_1a_7x7/conv/kernel
    .../BatchNorm/beta                          -> .../BatchNorm/bias
    .../BatchNorm/moving_mean                   -> batch_stats .../BatchNorm/mean
    .../BatchNorm/moving_variance               -> batch_stats .../BatchNorm/var
    InceptionV1/Mixed_3b/Branch_0/Conv2d_0a_1x1 -> InceptionV1/Mixed_3b/Branch_0_Conv2d_0a_1x1
    InceptionV1/Logits/Conv2d_0c_1x1/weights    -> Logits/kernel (1x1 conv squeezed to Dense)

Usage (offline, host-side; TF used only to read the checkpoint):

    python -m gvcnn_tf_tpu.tools.import_slim_checkpoint \
        --slim_checkpoint inception_v1.ckpt --output_dir /ckpts/imagenet_v1

The output is an Orbax checkpoint holding {'params': ..., 'batch_stats': ...}
consumable by TrainConfig.checkpoint_path.
"""

from __future__ import annotations

import argparse
import re
from typing import Dict, Tuple

import numpy as np

_BRANCH = re.compile(r"(Branch_\d+)/(\w+)")


def slim_name_to_flax_path(name: str) -> Tuple[str, Tuple[str, ...]]:
    """Map one slim variable name -> (collection, flax path tuple).

    collection is 'params' or 'batch_stats'.  Raises KeyError for variables
    we don't carry (e.g. optimizer slots, aux logits).
    """
    name = name.split(":")[0]
    if any(s in name for s in ("RMSProp", "Momentum", "Adam", "ExponentialMovingAverage",
                               "global_step", "AuxLogits")):
        raise KeyError(name)
    # Fold Branch_i/<conv> into the single module name we use.
    name = _BRANCH.sub(lambda m: f"{m.group(1)}_{m.group(2)}", name)
    parts = name.split("/")
    leaf = parts[-1]
    scope = parts[:-1]

    if leaf == "weights":
        if "Logits" in parts:
            return "params", ("Logits", "kernel")      # squeeze 1x1 conv
        return "params", tuple(scope) + ("conv", "kernel")
    if leaf == "biases":
        if "Logits" in parts:
            return "params", ("Logits", "bias")
        return "params", tuple(scope) + ("conv", "bias")
    if leaf == "beta":
        return "params", tuple(scope) + ("bias",)
    if leaf == "gamma":
        return "params", tuple(scope) + ("scale",)
    if leaf == "moving_mean":
        return "batch_stats", tuple(scope) + ("mean",)
    if leaf == "moving_variance":
        return "batch_stats", tuple(scope) + ("var",)
    raise KeyError(name)


def convert_slim_vars(slim_vars: Dict[str, np.ndarray]) -> Dict[str, dict]:
    """{slim_name: array} -> {'params': tree, 'batch_stats': tree}."""
    out: Dict[str, dict] = {"params": {}, "batch_stats": {}}
    for name, arr in slim_vars.items():
        try:
            coll, path = slim_name_to_flax_path(name)
        except KeyError:
            continue
        if path[:1] == ("Logits",) and path[-1] == "kernel" and arr.ndim == 4:
            arr = arr.reshape(arr.shape[-2], arr.shape[-1])  # (1,1,C,N)->(C,N)
        node = out[coll]
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(arr)
    return out


def read_tf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    reader = tf.train.load_checkpoint(path)
    return {
        name: reader.get_tensor(name)
        for name in reader.get_variable_to_shape_map()
    }


def main(argv=None):
    import orbax.checkpoint as ocp

    p = argparse.ArgumentParser()
    p.add_argument("--slim_checkpoint", required=True)
    p.add_argument("--output_dir", required=True)
    args = p.parse_args(argv)
    tree = convert_slim_vars(read_tf_checkpoint(args.slim_checkpoint))
    # Save at step 0 under a CheckpointManager so the output is directly
    # consumable by TrainConfig.checkpoint_path (train.py's warm-start reads
    # through Checkpointer/CheckpointManager, which needs step directories —
    # ADVICE r1: a raw StandardCheckpointer save broke that flow).
    mgr = ocp.CheckpointManager(
        args.output_dir,
        options=ocp.CheckpointManagerOptions(create=True),
    )
    mgr.save(0, args=ocp.args.StandardSave(tree))
    mgr.wait_until_finished()
    mgr.close()
    n = sum(1 for _ in _leaves(tree))
    print(f"wrote {n} arrays to {args.output_dir} (step 0)")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
