"""Inception-v1 (GoogLeNet) backbone in Flax, slim-compatible.

Re-implements the behavior of the reference's vendored TF-Slim
`nets/inception_v1.py` (SURVEY.md C6 + Appendix A): same endpoint names,
same channel plan, same arg-scope hyperparameters (BN decay 0.9997,
eps 0.001; weight decay 4e-5 is applied in the loss, not here), same
TF-'SAME' padding semantics (JAX 'SAME' pads bottom/right-heavy exactly like
TF, including the stride-2 7x7 stem).

Endpoint spec (SURVEY.md Appendix A, 224x224 input):
  Conv2d_1a_7x7 112x112x64 ... Mixed_5c 7x7x1024.

TPU-first notes: the module is dtype-polymorphic — convs/BN run in
`dtype` (bfloat16 on TPU) with fp32 params and fp32 BN statistics, which is
the MXU-friendly layout.  The view axis never appears here: the GVCNN
assembly folds (B, V, H, W, 3) -> (B*V, H, W, 3) before calling the backbone
(SURVEY.md B3) so convs run dense on the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gvcnn_tf_tpu.ops.pool import max_pool

# Truncated-normal stddev from slim's inception_v1 trunc_normal(0.09) [MED,
# SURVEY.md Appendix A]; biases are absent (BN provides the shift).
_TRUNC_STDDEV = 0.09


def _conv_init():
    return nn.initializers.truncated_normal(stddev=_TRUNC_STDDEV)


class ConvBNReLU(nn.Module):
    """slim.conv2d with batch_norm + relu (inception_arg_scope defaults)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=_conv_init(),
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,  # slim BN decay (0.9997 default)
            epsilon=0.001,            # slim BN eps
            dtype=self.dtype,
            param_dtype=jnp.float32,
            use_scale=False,          # slim BN default: scale=None (gamma off)
            name="BatchNorm",
        )(x)
        return nn.relu(x)


class _ConvKernel(nn.Module):
    """Bare conv kernel param under a module named 'conv', so alternative
    stem implementations keep the exact checkpoint path
    (.../conv/kernel) of the nn.Conv they replace."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", _conv_init(), self.shape, jnp.float32)


class SpaceToDepthStem(nn.Module):
    """7x7/2 stem as a 4x4/1 conv on space-to-depth(2) input — the MLPerf
    ResNet TPU trick.  A 3-channel stride-2 7x7 conv is MXU-hostile (C_in=3
    pads to the 8-sublane tile at 37% occupancy and the stride-2 gather
    defeats efficient im2col); transforming to (H/2, W/2, 12) inputs with an
    equivalent 4x4 stride-1 kernel packs the same FLOPs densely.

    EXACT equivalence with ConvBNReLU(64, (7,7), (2,2)) under TF-'SAME'
    padding on even inputs (pad (2,3)): pad the input (2,4)/(2,4) and the
    kernel to 8x8 with a zero bottom/right row — the extra zero row times
    the extra pad row contributes nothing — then split both into 2x2 space
    parities.  Parameters are IDENTICAL to the plain stem (a (7,7,3,64)
    kernel at .../conv/kernel + the same BatchNorm), so checkpoints swap
    freely between the two implementations (tested:
    tests/test_space_to_depth.py).
    """

    features: int
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    @nn.compact
    def __call__(self, x, train: bool = False):
        kernel = _ConvKernel((7, 7, x.shape[-1], self.features),
                             name="conv")()
        c = x.shape[-1]
        # Cast BEFORE the pad/reshape/transpose shuffle: the space-to-depth
        # rearrangement is a pure data movement over the full input and
        # costs half the HBM traffic in bf16.
        x = x.astype(self.dtype)
        # Input: TF-SAME pad (2,3) for kernel 7 stride 2 on even H/W, plus
        # one extra bottom/right row matching the kernel's zero row.
        xp = jnp.pad(x, ((0, 0), (2, 4), (2, 4), (0, 0)))
        n, h, w, _ = xp.shape
        xs = xp.reshape(n, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k4 = k8.reshape(4, 2, 4, 2, c, self.features)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        y = jax.lax.conv_general_dilated(
            xs,
            k4.astype(self.dtype),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=0.001,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            use_scale=False,
            name="BatchNorm",
        )(y)
        return nn.relu(y)


class _SplitConvBNReLU(nn.Module):
    """One inception-branch conv whose matmul is executed by the PARENT.

    Declares the identical parameter tree as ConvBNReLU (`conv/kernel` +
    `BatchNorm/*`) but exposes the kernel and the BN+relu epilogue as
    separate methods, so a Mixed block can concatenate several branches'
    kernels into ONE wide convolution (see InceptionBlock.merge_branches)
    and still apply each branch's own BatchNorm to its output slice.
    Checkpoints swap freely with the unmerged block.
    """

    features: int
    in_ch: int
    kernel_hw: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    def setup(self):
        # setup-assigned attribute names become the module names, giving
        # the exact ConvBNReLU parameter paths: `conv/kernel`, `BatchNorm/*`.
        self.conv = _ConvKernel(
            self.kernel_hw + (self.in_ch, self.features)
        )
        self.BatchNorm = nn.BatchNorm(
            momentum=self.bn_momentum,
            epsilon=0.001,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            use_scale=False,
        )

    def kernel(self) -> jnp.ndarray:
        return self.conv()

    def bn_relu(self, y, train: bool = False):
        return nn.relu(self.BatchNorm(y, use_running_average=not train))

    def __call__(self, y, train: bool = False):  # pragma: no cover
        return self.bn_relu(y, train)


class PallasStem(nn.Module):
    """7x7/2 stem running the conv as a hand-written Pallas TPU kernel
    (ops/pallas_stem.py). Identical parameter tree to ConvBNReLU
    (.../conv/kernel + BatchNorm); output matches the XLA lowering up to
    bf16 reassociation. The kernel emits bf16; BN statistics stay fp32."""

    features: int
    in_ch: int
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997

    def setup(self):
        self.conv = _ConvKernel((7, 7, self.in_ch, self.features))
        self.BatchNorm = nn.BatchNorm(
            momentum=self.bn_momentum,
            epsilon=0.001,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            use_scale=False,
        )

    def __call__(self, x, train: bool = False):
        from gvcnn_tf_tpu.ops.pallas_stem import stem_conv

        y = stem_conv(x, self.conv()).astype(self.dtype)
        return nn.relu(self.BatchNorm(y, use_running_average=not train))


class InceptionBlock(nn.Module):
    """One Mixed_* block.

    Branch plan matches slim inception_v1 (which uses 3x3 where the 2014
    paper used 5x5 in Branch_2 — a known slim deviation the reference
    inherits):
      Branch_0: 1x1 -> b0
      Branch_1: 1x1 -> b1_reduce, 3x3 -> b1
      Branch_2: 1x1 -> b2_reduce, 3x3 -> b2
      Branch_3: maxpool 3x3/1, 1x1 -> b3

    merge_branches ("none" | "1x1" | "full") is a TPU layout optimization
    with identical math and identical checkpoints:
      * "1x1": the three 1x1 convs reading the block input (Branch_0,
        Branch_1 reduce, Branch_2 reduce) run as ONE conv with
        b0+b1r+b2r output channels.  Small branch widths (16-96) pad onto
        the MXU's 128-lane output tile at 12-75% occupancy when run
        separately; merged they tile densely.  Exact: output channels of a
        conv are independent.
      * "full": additionally run the Branch_1/Branch_2 3x3 convs as one
        conv over channel-concatenated inputs with a block-diagonal
        kernel.  The zero blocks add extra (wasted) FLOPs but lift lane
        occupancy; exact because x*0 terms add exact zeros.
    """

    b0: int
    b1_reduce: int
    b1: int
    b2_reduce: int
    b2: int
    b3: int
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997
    merge_branches: str = "none"

    def _merged_conv(self, x, kernels, pads=None):
        """One conv over `x` with kernels concatenated on the output axis.

        `pads`: optional per-kernel (before, after) zero-padding widths on
        the INPUT-channel axis, to build a block-diagonal kernel for convs
        whose true inputs are channel-concatenated in `x`.
        """
        if pads is not None:
            kernels = [
                jnp.pad(k, ((0, 0), (0, 0), p, (0, 0)))
                for k, p in zip(kernels, pads)
            ]
        K = jnp.concatenate(kernels, axis=-1).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), K,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, m = self.dtype, self.bn_momentum
        if self.merge_branches == "none":
            br0 = ConvBNReLU(self.b0, (1, 1), dtype=d, bn_momentum=m, name="Branch_0_Conv2d_0a_1x1")(x, train)
            br1 = ConvBNReLU(self.b1_reduce, (1, 1), dtype=d, bn_momentum=m, name="Branch_1_Conv2d_0a_1x1")(x, train)
            br1 = ConvBNReLU(self.b1, (3, 3), dtype=d, bn_momentum=m, name="Branch_1_Conv2d_0b_3x3")(br1, train)
            br2 = ConvBNReLU(self.b2_reduce, (1, 1), dtype=d, bn_momentum=m, name="Branch_2_Conv2d_0a_1x1")(x, train)
            br2 = ConvBNReLU(self.b2, (3, 3), dtype=d, bn_momentum=m, name="Branch_2_Conv2d_0b_3x3")(br2, train)
            br3 = max_pool(x, (3, 3), (1, 1), padding="SAME")
            br3 = ConvBNReLU(self.b3, (1, 1), dtype=d, bn_momentum=m, name="Branch_3_Conv2d_0b_1x1")(br3, train)
            return jnp.concatenate([br0, br1, br2, br3], axis=-1)

        c = x.shape[-1]
        mb0 = _SplitConvBNReLU(self.b0, c, (1, 1), dtype=d, bn_momentum=m,
                               name="Branch_0_Conv2d_0a_1x1")
        mb1r = _SplitConvBNReLU(self.b1_reduce, c, (1, 1), dtype=d,
                                bn_momentum=m, name="Branch_1_Conv2d_0a_1x1")
        mb2r = _SplitConvBNReLU(self.b2_reduce, c, (1, 1), dtype=d,
                                bn_momentum=m, name="Branch_2_Conv2d_0a_1x1")
        y = self._merged_conv(x, [mb0.kernel(), mb1r.kernel(), mb2r.kernel()])
        s0, s1 = self.b0, self.b0 + self.b1_reduce
        br0 = mb0.bn_relu(y[..., :s0], train)
        a1 = mb1r.bn_relu(y[..., s0:s1], train)
        a2 = mb2r.bn_relu(y[..., s1:], train)

        if self.merge_branches == "full":
            mb1 = _SplitConvBNReLU(self.b1, self.b1_reduce, (3, 3), dtype=d,
                                   bn_momentum=m,
                                   name="Branch_1_Conv2d_0b_3x3")
            mb2 = _SplitConvBNReLU(self.b2, self.b2_reduce, (3, 3), dtype=d,
                                   bn_momentum=m,
                                   name="Branch_2_Conv2d_0b_3x3")
            z = self._merged_conv(
                jnp.concatenate([a1, a2], axis=-1),
                [mb1.kernel(), mb2.kernel()],
                pads=[(0, self.b2_reduce), (self.b1_reduce, 0)],
            )
            br1 = mb1.bn_relu(z[..., : self.b1], train)
            br2 = mb2.bn_relu(z[..., self.b1:], train)
        else:
            br1 = ConvBNReLU(self.b1, (3, 3), dtype=d, bn_momentum=m,
                             name="Branch_1_Conv2d_0b_3x3")(a1, train)
            br2 = ConvBNReLU(self.b2, (3, 3), dtype=d, bn_momentum=m,
                             name="Branch_2_Conv2d_0b_3x3")(a2, train)

        br3 = max_pool(x, (3, 3), (1, 1), padding="SAME")
        br3 = ConvBNReLU(self.b3, (1, 1), dtype=d, bn_momentum=m,
                         name="Branch_3_Conv2d_0b_1x1")(br3, train)
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)


# (endpoint, spec) in execution order.  Specs: ("conv", features, kernel,
# stride) | ("pool", kernel, stride) | ("mixed", b0, b1r, b1, b2r, b2, b3).
# Channel plan: SURVEY.md Appendix A.
_V1_PLAN: Sequence[Tuple[str, Tuple]] = (
    ("Conv2d_1a_7x7", ("conv", 64, (7, 7), (2, 2))),
    ("MaxPool_2a_3x3", ("pool", (3, 3), (2, 2))),
    ("Conv2d_2b_1x1", ("conv", 64, (1, 1), (1, 1))),
    ("Conv2d_2c_3x3", ("conv", 192, (3, 3), (1, 1))),
    ("MaxPool_3a_3x3", ("pool", (3, 3), (2, 2))),
    ("Mixed_3b", ("mixed", 64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", ("mixed", 128, 128, 192, 32, 96, 64)),
    ("MaxPool_4a_3x3", ("pool", (3, 3), (2, 2))),
    ("Mixed_4b", ("mixed", 192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", ("mixed", 160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", ("mixed", 128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", ("mixed", 112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", ("mixed", 256, 160, 320, 32, 128, 128)),
    ("MaxPool_5a_2x2", ("pool", (2, 2), (2, 2))),
    ("Mixed_5b", ("mixed", 256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", ("mixed", 384, 192, 384, 48, 128, 128)),
)

ENDPOINTS = tuple(name for name, _ in _V1_PLAN)

# Output channel count per endpoint (for head sizing / tests).
ENDPOINT_CHANNELS = {
    "Conv2d_1a_7x7": 64, "MaxPool_2a_3x3": 64, "Conv2d_2b_1x1": 64,
    "Conv2d_2c_3x3": 192, "MaxPool_3a_3x3": 192, "Mixed_3b": 256,
    "Mixed_3c": 480, "MaxPool_4a_3x3": 480, "Mixed_4b": 512,
    "Mixed_4c": 512, "Mixed_4d": 512, "Mixed_4e": 528, "Mixed_4f": 832,
    "MaxPool_5a_2x2": 832, "Mixed_5b": 832, "Mixed_5c": 1024,
}


class InceptionV1Base(nn.Module):
    """`inception_v1_base` equivalent: stem + Mixed blocks, endpoint dict.

    Reference: vendored slim nets/inception_v1.py `inception_v1_base`
    (SURVEY.md C6 [U] — structure pinned by the public slim net).
    """

    final_endpoint: str = "Mixed_5c"
    # When set, the module is a SEGMENT: the input is taken to be the
    # intermediate activation AT `start_endpoint` and only the layers
    # strictly after it (up to final_endpoint) run.  Used by the per-layer
    # attribution harness (tools/bench_layers.py marginal method) to time
    # one layer's in-context cost; layer names match the full tower's, so
    # segment params are a subtree of the full param tree.
    start_endpoint: str = ""
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9997
    # Run the 7x7/2 stem as a 4x4/1 conv on space-to-depth input (exact
    # equivalence, same params — see SpaceToDepthStem).  TPU-only benefit.
    stem_space_to_depth: bool = False
    # Merge Mixed-block branch convs into wider convs for MXU lane
    # occupancy ("none" | "1x1" | "full"); exact math, same checkpoints
    # (see InceptionBlock docstring).  Per-block overrides append
    # "Mixed_X=policy" terms: "1x1,Mixed_3b=full,Mixed_3c=full" runs the
    # block-diagonal 3x3 merge ONLY at the 28x28 blocks, whose Branch_2
    # reduce widths (16/32 input channels) tile the MXU's 128-deep
    # contracting axis at 12-25% when run separately — the geometry the
    # global "full" measurement (r3: occupancy gain cancelled by padded
    # FLOPs at 14x14) does not resolve (VERDICT r3 Next #4).
    merge_branches: str = "none"
    # Run the 7x7/2 stem as a hand-written Pallas kernel (TPU only; exact
    # math up to bf16 reassociation, same checkpoints — see
    # ops/pallas_stem.py for why XLA's lowering of this op is the model's
    # single worst-performing layer).
    stem_pallas: bool = False
    # SELECTIVE remat: when set to an endpoint name, the tower prefix
    # through that endpoint (inclusive) runs under jax.checkpoint — the
    # backward pass recomputes the large-spatial early activations (stem
    # output is 112^2 x 64, ~617 MB bf16 at batch 384) from the input
    # instead of keeping them in HBM.  "" = off.  Whole-backbone remat is
    # the GVCNN-level remat_backbone knob (measured 19% slower, r3);
    # this targets ONLY the layers whose saved activations dominate the
    # backward-pass HBM traffic (VERDICT r3 Next #1).
    remat_until: str = ""

    # Class-level metadata for the registry / GVCNN assembly.
    DEFAULT_RAW_ENDPOINT = "Mixed_3c"
    DEFAULT_FINAL_ENDPOINT = "Mixed_5c"
    DESCRIPTOR_DIM = 1024
    NAME = "InceptionV1"
    ENDPOINTS = ENDPOINTS
    ENDPOINT_CHANNELS = ENDPOINT_CHANNELS

    def _merge_for(self, name: str) -> str:
        """Resolve the merge policy for one Mixed block from the
        `merge_branches` spec: "<default>[,<block>=<policy>]*"."""
        terms = [t.strip() for t in self.merge_branches.split(",") if t]
        default = "none"
        policy = None
        for i, t in enumerate(terms):
            if "=" in t:
                blk, val = t.split("=", 1)
                if blk not in ENDPOINTS:
                    raise ValueError(f"merge_branches override for unknown "
                                     f"block {blk!r}")
                if val not in ("none", "1x1", "full"):
                    raise ValueError(f"bad merge policy {val!r}")
                if blk == name:
                    policy = val
            else:
                if t not in ("none", "1x1", "full"):
                    raise ValueError(f"bad merge policy {t!r}")
                if i != 0:
                    raise ValueError("default merge policy must be the "
                                     "first term")
                default = t
        return policy if policy is not None else default

    def _run_plan(self, x, plan, train: bool = False):
        """Run a contiguous slice of the layer plan; -> (x, endpoints)."""
        endpoints: Dict[str, jnp.ndarray] = {}
        for name, spec in plan:
            kind = spec[0]
            if kind == "conv":
                _, feats, kernel, stride = spec
                if name == "Conv2d_1a_7x7" and self.stem_pallas:
                    x = PallasStem(
                        feats, x.shape[-1], dtype=self.dtype,
                        bn_momentum=self.bn_momentum, name=name)(x, train)
                elif name == "Conv2d_1a_7x7" and self.stem_space_to_depth:
                    x = SpaceToDepthStem(
                        feats, dtype=self.dtype,
                        bn_momentum=self.bn_momentum, name=name)(x, train)
                else:
                    x = ConvBNReLU(feats, kernel, stride, dtype=self.dtype,
                                   bn_momentum=self.bn_momentum, name=name)(x, train)
            elif kind == "pool":
                _, kernel, stride = spec
                # Pools have no param scope; the named_scope puts the
                # endpoint name into HLO op_name metadata so profilers
                # (tools/profile_step.py) attribute them like the convs.
                with jax.named_scope(name):
                    x = max_pool(x, kernel, stride, padding="SAME")
            else:
                _, b0, b1r, b1, b2r, b2, b3 = spec
                x = InceptionBlock(b0, b1r, b1, b2r, b2, b3,
                                   dtype=self.dtype,
                                   bn_momentum=self.bn_momentum,
                                   merge_branches=self._merge_for(name),
                                   name=name)(x, train)
            endpoints[name] = x
        return x, endpoints

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.final_endpoint not in ENDPOINTS:
            raise ValueError(f"unknown endpoint {self.final_endpoint!r}")
        if self.start_endpoint:
            if self.start_endpoint not in ENDPOINTS:
                raise ValueError(f"unknown endpoint {self.start_endpoint!r}")
            if (ENDPOINTS.index(self.start_endpoint)
                    >= ENDPOINTS.index(self.final_endpoint)):
                raise ValueError(
                    f"start_endpoint {self.start_endpoint!r} must precede "
                    f"final_endpoint {self.final_endpoint!r}")
        x = x.astype(self.dtype)
        i0 = (ENDPOINTS.index(self.start_endpoint) + 1
              if self.start_endpoint else 0)
        i1 = ENDPOINTS.index(self.final_endpoint) + 1
        plan = _V1_PLAN[i0:i1]
        if not self.remat_until:
            return self._run_plan(x, plan, train)
        # Selective remat: checkpoint the [start..remat_until] prefix as one
        # jax.checkpoint region — its internals (the large-spatial early
        # activations) are recomputed in the backward pass; only the prefix
        # input and the boundary activation are saved.  The prefix's
        # endpoints remain remat OUTPUTS, so anything that actually reads
        # one (e.g. a raw_endpoint tap inside the prefix) stays saved and
        # unused ones are DCE'd.
        names = [n for n, _ in plan]
        if self.remat_until not in names:
            raise ValueError(
                f"remat_until {self.remat_until!r} not in the active plan "
                f"{names}")
        k = names.index(self.remat_until) + 1
        seg = nn.remat(InceptionV1Base._run_plan, static_argnums=(2, 3))
        x, endpoints = seg(self, x, plan[:k], train)
        x, rest = self._run_plan(x, plan[k:], train)
        endpoints.update(rest)
        return x, endpoints
