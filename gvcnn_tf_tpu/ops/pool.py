"""Max pooling with an opt-in alternative VJP (measured negative result).

Round-2 attribution flagged pool backwards (select-and-scatter) as a
~26 ms sinkhole; round-3 re-measurement (docs/PERF_VARIANTS.md r3) showed
that was methodology noise: in the flagship train step ALL pool backwards
cost ~17 ms combined, the strided plan pools sit within 1.1-1.4x of their
HBM-bytes bounds, and every replacement formulation tried measured SLOWER.
So the DEFAULT here (`impl="xla"`) is simply `flax.linen.max_pool`'s
lowering, and the backbones route through this wrapper only so the
alternative stays one switch away.

`impl="equality"` is the custom VJP kept from that study: a two-phase
backward with NO select-and-scatter — phase 1 computes each window's
first-argmax index (row-major) from K*K strided slices at output
resolution; phase 2 computes dx in one input-resolution elementwise pass,
crediting the upsampled cotangent where a position's in-window offset
equals the stored index.  Tie semantics match XLA's select-and-scatter
EXACTLY (first maximal element in row-major window order, verified
empirically; ReLU activations tie at 0 constantly, so "ties are
measure-zero" is false and matching the reference's crediting matters for
training-dynamics parity).  Fully covered by tests/test_pool.py and kept
for future XLA stacks where select-and-scatter may regress.

Reference parity: the reference's TF1 `tf.nn.max_pool` gradient
(MaxPoolGrad) credits a single argmax per window; both impls here keep
that contract.  (SURVEY.md C6/Appendix A: pool placement and SAME-padding
geometry; reference nets/inception_v1.py [U] uses slim max_pool2d with
TF-SAME.)
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _pads(size: int, k: int, s: int, padding: str) -> Tuple[int, int]:
    """TF-'SAME'/'VALID' (lo, hi) padding for one spatial dim."""
    if padding == "VALID":
        return 0, 0
    out = -(-size // s)  # ceil
    total = max((out - 1) * s + k - size, 0)
    lo = total // 2
    return lo, total - lo


def _pool_geometry(shape, kernel, strides, padding):
    """Per-spatial-dim (out_size, (pad_lo, pad_hi))."""
    geo = []
    for size, k, s in zip(shape[1:3], kernel, strides):
        lo, hi = _pads(size, k, s, padding)
        out = (size + lo + hi - k) // s + 1
        geo.append((out, (lo, hi)))
    return geo


def _reduce_window_max(x, kernel, strides, padding):
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        (1,) + tuple(kernel) + (1,),
        (1,) + tuple(strides) + (1,),
        padding=padding,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool(x, kernel: Tuple[int, int], strides: Tuple[int, int],
              padding: str):
    """`nn.max_pool(x, kernel, strides, padding)` with a fast VJP.

    NHWC only.  Forward is the identical `lax.reduce_window` max; only the
    backward lowering differs (see module docstring).
    """
    return _reduce_window_max(x, kernel, strides, padding)


def _fwd(x, kernel, strides, padding):
    y = _reduce_window_max(x, kernel, strides, padding)
    return y, (x, y)


def _upsample_axis(t, axis, size, pad_lo, stride, shift):
    """Window-indexed read at input resolution, as static ops only.

    Returns u with u[r] = t[(r + pad_lo) // stride - shift] along `axis`
    for r in [0, size), with out-of-range window indices clamped into the
    array (callers mask those positions via the validity predicate, so the
    clamped values are never used).  Lowered as repeat (reshape+broadcast)
    + pad + static slice — all fusable, no gathers.
    """
    m = t.shape[axis]
    if stride > 1:
        t = jnp.repeat(t, stride, axis=axis)
    # After repeat, element r' holds t[r' // stride]; we want index
    # r + pad_lo - stride * shift.
    offset = pad_lo - stride * shift
    lo = max(-offset, 0)
    hi = max(offset + size - m * stride, 0)
    pads = [(0, 0, 0)] * t.ndim
    pads[axis] = (lo, hi, 0)
    t = lax.pad(t, jnp.zeros((), t.dtype), pads)
    start = [0] * t.ndim
    start[axis] = offset + lo
    limit = list(t.shape)
    limit[axis] = start[axis] + size
    return lax.slice(t, start, limit)


def _bwd(kernel, strides, padding, res, g):
    """Two-phase equality backward (docs/PERF_VARIANTS.md round 3).

    Phase 1 (output resolution): f[w] = row-major index of the FIRST
    maximal element of window w, from K*K strided slices + selects.
    Phase 2 (input resolution, ONE elementwise fusion): every input
    position p lies in at most ceil(K/S)^2 windows; for each candidate,
    read f and g via repeat/shift upsampling and credit g where p's
    in-window offset equals f.  No select-and-scatter, and no chain of
    full-input-size dilated pads (a first attempt accumulated K*K dilated
    pads and measured 4-10x SLOWER than select-and-scatter in isolation;
    this formulation keeps phase 2 a single fused loop over dx).
    """
    x, y = res
    n, h, w, c = x.shape
    kh, kw = kernel
    sh, sw = strides
    (ho, (plh, phh)), (wo, (plw, phw)) = _pool_geometry(
        x.shape, kernel, strides, padding)

    if jnp.issubdtype(x.dtype, jnp.floating):
        pad_val = jnp.array(-jnp.inf, x.dtype)
    else:  # pragma: no cover - pools run on floats in this model
        pad_val = jnp.array(jnp.iinfo(x.dtype).min, x.dtype)
    xp = jnp.pad(x, ((0, 0), (plh, phh), (plw, phw), (0, 0)),
                 constant_values=pad_val)

    # Phase 1: first-max index per window, in row-major window order
    # (matches select-and-scatter tie semantics).  Iterate offsets last to
    # first so the earliest equal element wins the final select.
    f = jnp.full(y.shape, kh * kw, jnp.int32)
    for idx in range(kh * kw - 1, -1, -1):
        i, j = divmod(idx, kw)
        x_o = lax.slice(
            xp,
            (0, i, j, 0),
            (n, i + sh * (ho - 1) + 1, j + sw * (wo - 1) + 1, c),
            (1, sh, sw, 1),
        )
        f = jnp.where(x_o == y, idx, f)
    # Materialize f between phases: phase 2 reads it through several
    # shifted upsamplings, and re-inlining the K*K-slice computation into
    # each would re-read x many times over.
    f, g = lax.optimization_barrier((f, g))

    # Phase 2: input position (r, s) has in-window row offset
    # o_r = (r + pad_lo) % S + S * t for candidate t (and likewise for
    # columns); the candidate window is w_r = (r + pad_lo) // S - t.
    # Valid iff o_r < K and 0 <= w_r < n_windows.
    iota_r = lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    iota_c = lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    phase_r = (iota_r + plh) % sh
    phase_c = (iota_c + plw) % sw
    base_r = (iota_r + plh) // sh
    base_c = (iota_c + plw) // sw

    zero = jnp.zeros((), g.dtype)
    dx = None
    for tr in range(-(-kh // sh)):
        o_r = phase_r + sh * tr
        w_r = base_r - tr
        valid_r = (o_r < kh) & (w_r >= 0) & (w_r < ho)
        for tc in range(-(-kw // sw)):
            o_c = phase_c + sw * tc
            w_c = base_c - tc
            valid = valid_r & (o_c < kw) & (w_c >= 0) & (w_c < wo)
            f_up = _upsample_axis(
                _upsample_axis(f, 1, h, plh, sh, tr), 2, w, plw, sw, tc)
            g_up = _upsample_axis(
                _upsample_axis(g, 1, h, plh, sh, tr), 2, w, plw, sw, tc)
            credit = valid & (f_up == o_r * kw + o_c)
            term = jnp.where(credit, g_up, zero)
            dx = term if dx is None else dx + term
    return (dx.astype(x.dtype),)


_max_pool.defvjp(_fwd, _bwd)


def max_pool(x, kernel: Sequence[int], strides: Sequence[int],
             padding: str = "SAME", impl: str = "xla"):
    """Drop-in replacement for `flax.linen.max_pool` on NHWC inputs.

    impl="xla" (DEFAULT, evidence-based): the stock lowering whose backward
    is select-and-scatter.  Measured on v5e (round 3, docs/PERF_VARIANTS.md)
    it is ALREADY the fastest available backward on this stack: standalone
    net of dispatch overhead, MaxPool_2a's grad costs 2.7 ms vs its 1.9 ms
    HBM-bytes bound, and in the flagship train step all 13 pools' backward
    cost ~17 ms total (measured by swapping in a timing-only free backward:
    80.2 -> 63.2 ms).  Three replacement formulations each measured SLOWER:
    dilated-pad equality masks (4-10x), the two-phase first-argmax
    formulation below (3-8x), and separable Kx1/1xK decomposition (~2x).

    impl="equality": the custom-VJP two-phase backward — kept fully tested
    (tests/test_pool.py pins exact tie parity with select-and-scatter) as
    the documented negative result and for future XLA stacks where
    select-and-scatter may regress.
    """
    if padding not in ("SAME", "VALID"):
        raise ValueError(f"unsupported padding {padding!r}")
    if impl == "equality":
        return _max_pool(x, tuple(kernel), tuple(strides), padding)
    import flax.linen as nn

    return nn.max_pool(x, tuple(kernel), strides=tuple(strides),
                       padding=padding)
