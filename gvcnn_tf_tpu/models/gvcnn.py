"""GVCNN model assembly — TPU-first re-design of reference gvcnn.py.

Reference behavior (reference gvcnn.py:~L20-200 [U], SURVEY.md section 3.4):
a Python loop runs the shared-weight backbone V times, one view at a time,
then buckets views into M groups by an FCN discrimination score, max-pools
descriptors within groups, and fuses groups by score-derived weights.

TPU-first differences (SURVEY.md B2/B3):
  * The view axis is folded into the batch axis — ONE dense (B*V, H, W, 3)
    backbone pass instead of V sequential graph copies, so conv/matmul runs
    large and batched on the MXU.
  * The scoring FCN taps an early endpoint of the SAME backbone pass (no
    second stem evaluation).
  * Grouping/pooling/fusion is static-shaped mask math (ops/grouping.py),
    optionally fused into a Pallas kernel (ops/pallas_grouping.py) so the
    head never materializes the (B, M, V, C) broadcast in HBM.

End-point parity: the returned `end_points` dict carries the tensors the
north-star parity check inspects (`view_discrimination_scores`,
`group_scheme`, `group_weight`, `Logits`, `Predictions`) with reference
names (BASELINE.json:5, SURVEY.md section 7 "Public API surface").
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gvcnn_tf_tpu.configs import GVCNNConfig
from gvcnn_tf_tpu.models.backbones import get_backbone
from gvcnn_tf_tpu.models.backbones.inception_v1 import ConvBNReLU
from gvcnn_tf_tpu.ops import grouping as G


def _global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """slim's 7x7 avg-pool head == global average pool for 224 input."""
    return jnp.mean(x, axis=(1, 2))


def _backbone_kwargs(cfg: GVCNNConfig, backbone_cls) -> dict:
    """Optional backbone constructor kwargs a config may override."""
    kw = {}
    if cfg.bn_momentum is not None:
        kw["bn_momentum"] = cfg.bn_momentum
    fields = getattr(backbone_cls, "__dataclass_fields__", {})
    if cfg.stem_space_to_depth and "stem_space_to_depth" in fields:
        kw["stem_space_to_depth"] = True
    if (cfg.merge_inception_branches != "none"
            and "merge_branches" in fields):
        kw["merge_branches"] = cfg.merge_inception_branches
    if (cfg.stem_pallas and "stem_pallas" in fields
            and jax.default_backend() == "tpu"):
        kw["stem_pallas"] = True
    if cfg.remat_until and "remat_until" in fields:
        kw["remat_until"] = cfg.remat_until
    return kw


def _resolve_endpoints(cfg: GVCNNConfig, backbone_cls) -> Tuple[str, str]:
    """(raw_endpoint, final_endpoint) valid for the chosen backbone.

    Config endpoints name Inception-v1 layers by default; when the backbone
    is swapped (--backbone inception_v3/...), endpoints that don't exist
    there fall back to the backbone's documented defaults instead of a
    KeyError deep inside tracing.
    """
    eps = getattr(backbone_cls, "ENDPOINTS", None)
    raw, fin = cfg.raw_endpoint, cfg.final_endpoint
    if eps is not None:
        if raw not in eps:
            raw = backbone_cls.DEFAULT_RAW_ENDPOINT
        if fin not in eps:
            fin = backbone_cls.DEFAULT_FINAL_ENDPOINT
        # Endpoint names collide across backbones (v1 and v3 both have a
        # "Mixed_5c" at very different depths); if the surviving pair is
        # out of order — the scoring tap at/after the final endpoint — the
        # config was written for another backbone: use this one's defaults.
        if eps.index(raw) >= eps.index(fin):
            raw = backbone_cls.DEFAULT_RAW_ENDPOINT
            fin = backbone_cls.DEFAULT_FINAL_ENDPOINT
    return raw, fin


class GroupingModule(nn.Module):
    """View-discrimination FCN (reference C4a).

    Runs on the raw view descriptor (an early backbone endpoint): 1x1
    conv+BN+relu -> 1x1 conv to a single channel -> global average pool ->
    raw scalar per view.  Squashing to (0,1) happens in the caller (it may
    be a softmax over the view axis, which needs the unfolded (B, V) view).
    Scoring runs in fp32 — it is tiny and drives bucketing decisions.
    """

    hidden: int = 128
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, raw_feats, train: bool = False):
        x = ConvBNReLU(self.hidden, (1, 1), dtype=self.dtype,
                       bn_momentum=self.bn_momentum,
                       name="Conv2d_score_1x1")(raw_feats, train)
        x = nn.Conv(1, (1, 1), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="Conv2d_score_logit")(x)
        return _global_avg_pool(x.astype(jnp.float32))[..., 0]  # (B*V,)


class SingleViewClassifier(nn.Module):
    """BASELINE config 1: backbone + slim-style logits head, single view.

    Equivalent to the reference running `inception_v1(inputs, num_classes)`
    directly (slim head: avg-pool 7x7 -> dropout(keep 0.8) -> 1x1 conv to
    num_classes -> squeeze; SURVEY.md Appendix A "Head").
    """

    config: GVCNNConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        if x.ndim == 5:            # accept (B, 1, H, W, 3) for API parity
            x = x[:, 0]
        backbone_cls = get_backbone(cfg.backbone)
        _, final_ep = _resolve_endpoints(cfg, backbone_cls)
        feats, endpoints = backbone_cls(
            final_endpoint=final_ep, dtype=dtype,
            name=getattr(backbone_cls, "NAME", cfg.backbone),
            **_backbone_kwargs(cfg, backbone_cls),
        )(x, train)
        net = _global_avg_pool(feats.astype(jnp.float32))
        net = nn.Dropout(rate=1.0 - cfg.dropout_keep_prob,
                         deterministic=not train)(net)
        logits = nn.Dense(cfg.data.num_classes, name="Logits")(net)
        end_points: Dict[str, jnp.ndarray] = {
            "Logits": logits,
            "Predictions": jax.nn.softmax(logits, axis=-1),
        }
        return logits, end_points


class GVCNN(nn.Module):
    """Full multi-view GVCNN (reference `gvcnn()` equivalent).

    __call__(x: (B, V, H, W, 3), train) -> (logits (B, num_classes),
    end_points dict).
    """

    config: GVCNNConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        B, V = x.shape[0], x.shape[1]
        M = cfg.num_group

        # --- B3: fold views into batch, one dense MXU pass ---
        xf = x.reshape((B * V,) + x.shape[2:])

        backbone_cls = get_backbone(cfg.backbone)
        raw_ep, final_ep = _resolve_endpoints(cfg, backbone_cls)
        if cfg.remat_backbone:
            # Recompute backbone activations in the backward pass instead of
            # keeping them in HBM (SURVEY.md: remat to trade FLOPs for
            # memory/bandwidth).  Static argnums: `train` is a Python bool.
            backbone_cls = nn.remat(backbone_cls, static_argnums=(2,))
        feats, endpoints = backbone_cls(
            final_endpoint=final_ep, dtype=dtype,
            name=getattr(backbone_cls, "NAME", cfg.backbone),
            **_backbone_kwargs(cfg, backbone_cls),
        )(xf, train)

        # Final view descriptors: final endpoint + GAP (fp32 from here on —
        # the grouping head is tiny and precision-sensitive).
        descs = _global_avg_pool(feats.astype(jnp.float32))       # (B*V, C)
        descs = descs.reshape(B, V, -1)

        # Raw view descriptors -> discrimination scores (C4a).
        raw_feats = endpoints[raw_ep]
        raw_scores = GroupingModule(
            dtype=dtype, name="GroupingModule",
            **({} if cfg.bn_momentum is None
               else {"bn_momentum": cfg.bn_momentum}),
        )(raw_feats, train).reshape(B, V)
        scores = G.squash_scores(raw_scores, cfg.score_squash)    # (B, V)

        # Grouping + pooling + fusion (C4b-C4e), Pallas-fused when enabled
        # and running on TPU; pure-jnp oracle otherwise.
        if cfg.use_pallas_grouping and jax.default_backend() == "tpu":
            from gvcnn_tf_tpu.ops.pallas_grouping import group_and_fuse_pallas
            fused, weights, scheme = group_and_fuse_pallas(
                scores, descs, M, cfg.group_weight
            )
        else:
            fused, weights, scheme = G.group_and_fuse(
                scores, descs, M, cfg.group_weight
            )

        net = nn.Dropout(rate=1.0 - cfg.dropout_keep_prob,
                         deterministic=not train)(fused)
        logits = nn.Dense(cfg.data.num_classes, name="Logits")(net)

        end_points: Dict[str, jnp.ndarray] = {
            "view_descriptors": descs,
            "view_discrimination_scores": scores,
            "group_scheme": scheme,
            "group_weight": weights,
            "shape_descriptor": fused,
            "Logits": logits,
            "Predictions": jax.nn.softmax(logits, axis=-1),
        }
        return logits, end_points


class MVCNN(nn.Module):
    """MVCNN baseline (Su et al., ICCV 2015): shared backbone per view +
    element-wise max over ALL view descriptors, no grouping module.

    The GVCNN paper's comparison baseline (SURVEY.md section 6, 90.1% on
    ModelNet40); equivalent to GVCNN with a single all-views group and
    uniform weight.  Uses the same B*V folding as GVCNN.
    """

    config: GVCNNConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        B, V = x.shape[0], x.shape[1]
        xf = x.reshape((B * V,) + x.shape[2:])
        backbone_cls = get_backbone(cfg.backbone)
        _, final_ep = _resolve_endpoints(cfg, backbone_cls)
        feats, _ = backbone_cls(
            final_endpoint=final_ep, dtype=dtype,
            name=getattr(backbone_cls, "NAME", cfg.backbone),
            **_backbone_kwargs(cfg, backbone_cls),
        )(xf, train)
        descs = _global_avg_pool(feats.astype(jnp.float32)).reshape(B, V, -1)
        pooled = jnp.max(descs, axis=1)                   # view pooling
        net = nn.Dropout(rate=1.0 - cfg.dropout_keep_prob,
                         deterministic=not train)(pooled)
        logits = nn.Dense(cfg.data.num_classes, name="Logits")(net)
        end_points = {
            "view_descriptors": descs,
            "shape_descriptor": pooled,
            "Logits": logits,
            "Predictions": jax.nn.softmax(logits, axis=-1),
        }
        return logits, end_points


def build_model(config: GVCNNConfig) -> nn.Module:
    """Model factory: config -> Flax module (reference `gvcnn()` / slim net)."""
    if not config.multi_view:
        return SingleViewClassifier(config=config)
    if config.model == "mvcnn":
        return MVCNN(config=config)
    if config.model == "gvcnn":
        return GVCNN(config=config)
    raise ValueError(f"unknown model family {config.model!r}")


def init_model(
    config: GVCNNConfig, rng: jax.Array, input_shape: Tuple[int, ...] = None
):
    """Initialize params + batch_stats for a model.

    Returns (model, variables).  `input_shape` defaults to the config's
    (B, V, H, W, 3) — pass a smaller one for fast tests.
    """
    model = build_model(config)
    d = config.data
    if input_shape is None:
        if config.multi_view:
            input_shape = (d.batch_size, d.num_views, d.height, d.width, 3)
        else:
            input_shape = (d.batch_size, d.height, d.width, 3)
    import functools

    dummy = jnp.zeros(input_shape, jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng}, dummy
    )
    return model, variables
