"""Export a trained GVCNN to a serialized StableHLO artifact for serving.

The reference has no export story (TF1 checkpoints + rebuild-the-graph).
For a JAX/TPU deployment the natural artifact is `jax.export`: a versioned,
runtime-loadable StableHLO program with the weights baked in, callable from
any process (including non-Python runtimes via PJRT) without the model
code.

CLI:
    python -m gvcnn_tf_tpu.tools.export_model --config mn40_12view \
        --checkpoint_dir /ckpts/run1 --output /models/gvcnn.stablehlo \
        [--batch_size 8]

Load side: `deserialize_and_call` below, or any StableHLO-capable runtime.
"""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp
from jax import export as jax_export

from gvcnn_tf_tpu.configs import GVCNNConfig, add_flags, config_from_flags
from gvcnn_tf_tpu.models.gvcnn import init_model


def export_model(
    config: GVCNNConfig,
    checkpoint_dir: Optional[str] = None,
    *,
    state=None,
    batch_size: Optional[int] = None,
    fold_bn: bool = True,
) -> bytes:
    """Serialize the eval-mode forward pass (weights baked in) -> bytes.

    `fold_bn` (default on) folds BatchNorm scales into the baked-in conv
    kernels first — an exact transform, so the exported StableHLO carries
    pre-folded constants."""
    model, init_vars = init_model(config, jax.random.key(config.train.seed))
    if state is not None:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    elif checkpoint_dir:
        from gvcnn_tf_tpu.checkpoint import Checkpointer

        target = {
            "params": init_vars["params"],
            "batch_stats": init_vars.get("batch_stats", {}),
        }
        variables = Checkpointer(checkpoint_dir).restore_partial(target)
    else:
        variables = init_vars  # untrained export (shape/pipeline testing)
    if fold_bn:
        from gvcnn_tf_tpu.utils import fold_batch_norm

        variables = fold_batch_norm(variables)

    d = config.data
    B = batch_size or d.batch_size
    if config.multi_view:
        x_spec = jax.ShapeDtypeStruct((B, d.num_views, d.height, d.width, 3),
                                      jnp.float32)
    else:
        x_spec = jax.ShapeDtypeStruct((B, d.height, d.width, 3), jnp.float32)

    def forward(x):
        logits, ep = model.apply(variables, x, train=False)
        return logits, ep["Predictions"]

    exported = jax_export.export(jax.jit(forward))(x_spec)
    return exported.serialize()


def deserialize_and_call(blob: bytes, x):
    """Rehydrate an exported artifact and run it (serving-side helper)."""
    exported = jax_export.deserialize(blob)
    return exported.call(x)


def main(argv=None):
    p = argparse.ArgumentParser(description="export GVCNN to StableHLO")
    add_flags(p)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--export_batch_size", type=int, default=None)
    p.add_argument("--no_fold_bn", action="store_true",
                   help="export with BatchNorm left unfolded")
    args = p.parse_args(argv)
    config = config_from_flags(args)
    blob = export_model(
        config,
        checkpoint_dir=args.checkpoint_dir or config.train.train_logdir,
        batch_size=args.export_batch_size,
        fold_bn=not args.no_fold_bn,
    )
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"wrote {len(blob)} bytes to {args.output}")


if __name__ == "__main__":
    main()
