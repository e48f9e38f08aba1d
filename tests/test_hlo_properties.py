"""Compiler-facing guards: the lowered HLO must have the properties the
TPU-first design depends on (bf16 convolutions, no per-view loop unrolling,
single fused backbone call on the folded (B*V) batch)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp

from gvcnn_tf_tpu.configs import get_config
from gvcnn_tf_tpu.models.gvcnn import build_model


def _lower_text(compute_dtype):
    cfg = get_config("mn10_8view")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, height=64, width=64,
                                 batch_size=2, num_views=4),
        compute_dtype=compute_dtype,
        use_pallas_grouping=False,
    )
    model = build_model(cfg)
    x = jnp.zeros((2, 4, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False),
        {"params": jax.random.key(0)}, x,
    )
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )
    lowered = jax.jit(
        functools.partial(model.apply, train=False)
    ).lower(variables, x)
    return lowered.as_text()


def test_bf16_model_has_no_f32_convolutions():
    """compute_dtype=bfloat16 must put every conv on the MXU in bf16 —
    f32 creep in the backbone would halve throughput silently.

    StableHLO text types trail the op: `: (tensor<8x..xbf16>, ...) ->
    tensor<..xbf16>`; any `xf32>` in a convolution signature is a leak.
    """
    txt = _lower_text("bfloat16")
    conv_lines = [l for l in txt.splitlines() if "stablehlo.convolution" in l]
    assert conv_lines, "no convolutions found in HLO?"
    bad = [l for l in conv_lines if "xf32>" in l]
    assert not bad, f"f32 convolutions leaked into bf16 model: {bad[:2]}"


def test_stem_conv_padding_matches_tf_same():
    """TF 'SAME' pads bottom/right-heavy; for the stride-2 7x7 stem on an
    even input the pad must be [[2,3],[2,3]] (SURVEY.md Appendix A warns to
    verify exactly this — slim checkpoint parity depends on it)."""
    txt = _lower_text("float32")
    stem = [l for l in txt.splitlines()
            if "stablehlo.convolution" in l and "tensor<8x64x64x3xf32>" in l]
    assert len(stem) == 1
    assert "pad = [[2, 3], [2, 3]]" in stem[0], stem[0][:200]


def test_view_axis_is_folded_not_unrolled():
    """One backbone pass on (B*V=8, ...): exactly one stem conv consuming
    tensor<8x64x64x3x...> and no batch-2/batch-1 stem convs (which would
    mean the reference's per-view Python loop survived)."""
    txt = _lower_text("float32")
    conv_lines = [l for l in txt.splitlines() if "stablehlo.convolution" in l]
    stem = [l for l in conv_lines if "tensor<8x64x64x3xf32>" in l]
    assert len(stem) == 1, f"expected 1 folded stem conv, got {len(stem)}"
    assert not any("tensor<2x64x64x3xf32>" in l or "tensor<1x64x64x3xf32>" in l
                   for l in conv_lines), "per-view conv detected"
