"""BatchNorm folding for inference (exact algebraic transform at load time).

At eval, Conv (no bias) -> BatchNorm(running stats) computes

    y = gamma * (W*x - mu) / sqrt(var + eps) + beta .

Folding multiplies the per-output-channel factor s = gamma / sqrt(var+eps)
into the conv kernel and rewrites the BN parameters so the (structurally
unchanged) BN layer degenerates to `y = x + beta'`:

    W'    = W * s           (broadcast over the kernel's last/out axis)
    beta' = beta - mu * s
    mu'   = 0,  var' = 1 - eps,  gamma' = 1        (so BN(x) == x + beta')

The transform is exact (same floats up to reassociation), so folded
variables drive the SAME Flax module — no second model definition, and any
checkpoint can be folded after restore.  eval/predict/serve expose it as
--fold_bn; tools/export_model.py folds by default (the exported StableHLO
then carries constant-folded scales).

Eps bookkeeping: slim inception arg-scope uses eps 1e-3, slim resnet
arg-scope 1e-5 (models/backbones/*.py); the scope NAME picks the right one
so mixed trees (ResNet backbone + inception-style GroupingModule) fold
correctly.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

# Kernel keys a BatchNorm sibling folds into, in priority order
# (SeparableConvBNReLU folds into the pointwise projection).
_KERNEL_KEYS = ("conv", "pointwise")


def _default_eps(path) -> float:
    root = path[0] if path else ""
    return 1e-5 if str(root).startswith("ResNet") else 1e-3


def fold_batch_norm(
    variables: Dict[str, Any],
    eps_fn: Optional[Callable[[tuple], float]] = None,
) -> Dict[str, Any]:
    """-> new {'params', 'batch_stats'} with conv+BN pairs folded.

    Walks the params/batch_stats trees in lockstep; wherever a module holds
    both a conv kernel and a BatchNorm with running stats, the scale is
    folded into the kernel.  Modules without stats (Dense heads, the score
    logit conv) pass through untouched.
    """
    eps_fn = eps_fn or _default_eps
    params = jax.tree.map(lambda x: x, variables["params"])   # shallow copy
    stats = jax.tree.map(lambda x: x, variables.get("batch_stats", {}))

    def walk(p_node, s_node, path):
        if not isinstance(p_node, dict):
            return
        bn_p = p_node.get("BatchNorm")
        bn_s = s_node.get("BatchNorm") if isinstance(s_node, dict) else None
        kernel_key = next(
            (k for k in _KERNEL_KEYS
             if isinstance(p_node.get(k), dict) and "kernel" in p_node[k]),
            None,
        )
        if (
            isinstance(bn_p, dict)
            and isinstance(bn_s, dict)
            and "mean" in bn_s
            and kernel_key is not None
        ):
            eps = eps_fn(path)
            mean = jnp.asarray(bn_s["mean"], jnp.float32)
            var = jnp.asarray(bn_s["var"], jnp.float32)
            gamma = jnp.asarray(
                bn_p.get("scale", jnp.ones_like(var)), jnp.float32
            )
            beta = jnp.asarray(
                bn_p.get("bias", jnp.zeros_like(var)), jnp.float32
            )
            s = gamma / jnp.sqrt(var + eps)

            kern = p_node[kernel_key]["kernel"]
            p_node[kernel_key] = dict(p_node[kernel_key])
            p_node[kernel_key]["kernel"] = (
                kern.astype(jnp.float32) * s
            ).astype(kern.dtype)

            new_bn = dict(bn_p)
            new_bn["bias"] = beta - mean * s
            if "scale" in new_bn:
                new_bn["scale"] = jnp.ones_like(gamma)
            p_node["BatchNorm"] = new_bn
            s_node["BatchNorm"] = {
                "mean": jnp.zeros_like(mean),
                "var": jnp.full_like(var, 1.0 - eps),
            }
        for k, v in p_node.items():
            if isinstance(v, dict) and k != "BatchNorm":
                sub_s = s_node.get(k, {}) if isinstance(s_node, dict) else {}
                walk(v, sub_s, path + (k,))

    # Deep-copy dict spines so the input tree is never mutated.
    def deep(d):
        return {
            k: deep(v) if isinstance(v, dict) else v for k, v in d.items()
        }

    params, stats = deep(params), deep(stats)
    walk(params, stats, ())
    return {"params": params, "batch_stats": stats}
