"""Pallas TPU kernel for the Inception stem conv (7x7, stride 2, C_in=3).

WHY: the stem is the single worst op in the whole model on v5e. Measured
(docs/PERF_LAYERS.md, batch 384x224x224): XLA lowers every formulation of
this conv — direct, bf16, space-to-depth 4x4/C12, even 2x2/C48 — to a
~7-8 ms program, 0.12-0.25 of the op's own roofline (speed of light is
~1.5 ms: 91 GFLOP at the MXU's padded rate + 731 MB of HBM traffic).
A 3-channel stride-2 7x7 conv defeats XLA's conv tiling: the im2col
expansion re-reads the input up to 49x from HBM.

WHAT: this kernel reads each (padded) input row once into VMEM, builds the
im2col ("G") matrix on-chip where re-reads are free, and feeds the MXU with
dense matmuls:

  * Input is padded to (N, H+5, W+6, 3) (TF-'SAME' pad (2,3) + one dead
    trailing column) and viewed flat per row: 3*(W+6) values = 6 values per
    OUTPUT column ((W+6)/2, 6).  Element (2j+dj-2+2, ch) of a padded row
    lives at flat position 6j + m, m = 3*dj + ch in [0, 21).
  * Writing m = 6a + b: G24_r[j, m] = X2_r[j + a, b] where X2_r is the
    (W6/2, 6) view of padded row r — so the whole 24-lane G24 block is
    FOUR sublane-shifted copies of X2_r, lane-concatenated: pure cheap
    VPU moves, no strided gathers.
  * Output rows are produced in PAIRS: rows (2i, 2i+1) need the 9 input
    rows 4i..4i+8, i.e. G lanes [96*i : 96*i + 216].  The weight matrix B
    (216, 128) stacks the reshaped 7x7x3x64 kernel twice — columns 0:64
    for the even row (row offset 0) and 64:128 for the odd row (offset 2)
    — so ONE (W/2, 216) @ (216, 128) matmul fills all 128 MXU lanes with
    useful channels.  MXU packing efficiency ~60% vs <15% for XLA's
    lowering.

Measured on v5e-1 (batch 384): see docs/PERF_LAYERS.md "Pallas stem".

The backward pass delegates to XLA's conv VJP (measured ~1.2 ms — the
forward was the problem, not the backward); dx's subgraph is dead code
when x is a data input and XLA removes it.

Reference parity: this replaces the reference's `slim.conv2d(64, [7,7],
stride=2)` stem (vendored slim inception_v1.py Conv2d_1a_7x7 [U],
SURVEY.md Appendix A) bit-compatibly up to bf16 reassociation; identical
parameter tree (tests/test_pallas_stem.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stem_kernel(x_ref, b_ref, o_ref, g_ref, *, h_out, w_out):
    """One grid step = one sample.

    x_ref: (1, H6, F) bf16 — padded sample, rows flattened (F = 3*(W+6)).
    b_ref: (216, 128) bf16 — stacked weights (even row | odd row).
    o_ref: (1, h_out, w_out, 64) bf16 output block.
    g_ref: (w_out, H6*24) bf16 scratch — per-row G24 blocks, lane-packed.
    """
    h6 = x_ref.shape[1]
    f = x_ref.shape[2]
    x2 = x_ref[0].reshape(h6, f // 6, 6)  # (H6, W6/2, 6)

    # G24 per input row: four sublane-shifted copies, lane-concatenated.
    for r in range(h6):
        g_ref[:, 24 * r:24 * (r + 1)] = jnp.concatenate(
            [x2[r, a:w_out + a, :] for a in range(4)], axis=1
        )

    # Output row pairs: rows (2i, 2i+1) read input rows 4i..4i+8.
    for i in range(h_out // 2):
        a = g_ref[:, 96 * i:96 * i + 216]                  # (w_out, 216)
        acc = jnp.dot(a, b_ref[:], preferred_element_type=jnp.float32)
        o_ref[0, 2 * i] = acc[:, :64].astype(o_ref.dtype)
        o_ref[0, 2 * i + 1] = acc[:, 64:].astype(o_ref.dtype)


def _pack_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, 3, 64) -> (216, 128): [9 input rows x 24 flat taps] x
    [even-row 64ch | odd-row 64ch]. Row offset of the odd output row is 2."""
    k2 = jnp.zeros((7, 24, 64), w.dtype)
    # m = 3*dj + ch: (7, 7, 3, 64) -> (7, 21, 64), zero-padded to 24.
    k2 = k2.at[:, :21, :].set(w.reshape(7, 21, 64))
    b = jnp.zeros((9, 24, 128), w.dtype)
    b = b.at[0:7, :, 0:64].set(k2)      # even row: r_local = di
    b = b.at[2:9, :, 64:128].set(k2)    # odd row:  r_local = di + 2
    return b.reshape(216, 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stem_fwd(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """x (N, H, W, 3) any float dtype, w (7, 7, 3, 64) ->
    (N, H/2, W/2, 64) bf16. TF-'SAME' padding for even H/W.

    H must be divisible by 4: the kernel emits output rows in pairs
    (`range(h_out // 2)` above), so h % 4 == 2 would silently leave the
    last output row as uninitialized VMEM garbage if it passed the gate.
    """
    n, h, width, c = x.shape
    assert c == 3 and h % 4 == 0 and width % 2 == 0, (h, width, c)
    h_out, w_out = h // 2, width // 2
    xb = x.astype(jnp.bfloat16)
    # TF-SAME pad (2,3) each side + 1 dead trailing col so flat%6 == 0.
    xp = jnp.pad(xb, ((0, 0), (2, 3), (2, 4), (0, 0)))
    h6, f = h + 5, 3 * (width + 6)
    xf = xp.reshape(n, h6, f)
    b = _pack_weights(w.astype(jnp.bfloat16))

    kernel = functools.partial(_stem_kernel, h_out=h_out, w_out=w_out)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, 64), jnp.bfloat16),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h6, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((216, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h_out, w_out, 64), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((w_out, h6 * 24), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h_out * w_out * 147 * 64,
            bytes_accessed=xf.size * 2 + n * h_out * w_out * 64 * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, b)


def _reference_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """The op this kernel replaces (XLA lowering), for VJP + parity."""
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(2, 2), padding=[(2, 3), (2, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def stem_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """7x7/2 stem conv, Pallas forward + XLA backward (see module doc)."""
    return _stem_fwd(x, w)


def _stem_conv_fwd(x, w):
    return _stem_fwd(x, w), (x, w)


def _stem_conv_bwd(res, g):
    x, w = res
    _, pullback = jax.vjp(_reference_conv, x, w)
    dx, dw = pullback(g.astype(jnp.bfloat16))
    # dx is dead code when x is a data input; XLA DCEs it. dw accumulates
    # in the caller's param dtype.
    return dx.astype(x.dtype), dw.astype(w.dtype)


stem_conv.defvjp(_stem_conv_fwd, _stem_conv_bwd)


def stem_conv_reference(x, w):
    """Public alias of the XLA lowering (tests compare against this)."""
    return _reference_conv(x, w)
