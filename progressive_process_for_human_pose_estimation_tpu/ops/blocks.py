"""Core conv blocks of the reference model zoo, NHWC flax modules.

Covers every residual-block variant the reference evolved through:

- :class:`ResidualBlock` — the final pre-activation bottleneck with stride
  support, BN on the projection skip, and a trailing BN before the add
  (/root/reference/train.py:411-447, identical copy at
  /root/reference/hourglass_compare.py:405-442). The reference's skip
  condition ``stride != 1 | numIn != numOut`` parses (operator precedence) as
  a chained comparison against ``1 | numIn``, which is true for every
  instantiation in the repo, so the projection is *always* taken; we keep
  that behaviour behind ``always_project`` (default True for parity) and
  offer the intended identity-skip behaviour when False.
- :class:`ResidualBlockLite` — the earlier variant without stride/BN-skip and
  with a biased 1x1 projection only on channel change
  (/root/reference/only_one_hourgless.py:135-166,
  /root/reference/try_with_torch.py:179-209).
- :class:`ConvBNReLU` — the ``lin`` head block
  (/root/reference/only_one_hourgless.py:199-212) and the ``_ASPPModule``
  conv (bias-free) pattern (/root/reference/train.py:450-462).
- :class:`ASPPBlock` — atrous spatial pyramid pooling bottleneck: 1x1 +
  three dilated 3x3 branches (d=6/12/18) + global-average-pool branch,
  concatenated (5*256 = 1280 ch) then fused by a 1x1
  (/root/reference/train.py:465-495).

Layout/precision conventions: NHWC activations, HWIO conv kernels, compute in
``dtype`` (bf16 by default at call sites), parameters and BatchNorm statistics
in ``param_dtype`` (fp32). BatchNorm matches torch defaults (eps 1e-5,
running-stat update factor 0.1 → flax momentum 0.9) and can reduce batch
statistics across a mesh axis via ``bn_axis_name`` (cross-replica BN; the
reference is single-device so the parity default is None).
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resize import global_avg_pool, resize_bilinear_align_corners

# torch nn.Conv2d default weight init is kaiming_uniform(a=sqrt(5)):
# bound = sqrt(3) * sqrt(2 / (1 + 5)) / sqrt(fan_in) → variance = (1/3)/fan_in.
torch_conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_conv_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _SpaceToDepthConv7(nn.Module):
    """7x7 stride-2 conv evaluated as a 4x4 stride-1 conv on space-to-depth
    input — exactly the same math, MXU-friendly contraction.

    The stem conv (7x7/2 on 3-channel images, /root/reference/train.py:548)
    has a contraction of only 7*7*3 = 147 over 3 input channels, which XLA
    lane-pads so badly it runs at ~6.6 TFLOPs on v5e (measured). Packing each
    2x2 pixel block into channels turns it into a 4x4 conv over 4*C channels:
    out(i,j) = sum_a K[a] x[2i-3+a] with a-3 = 2u+dy becomes a 4-tap conv in
    block space (u in [-2,1] -> padding (2,1)) over the (dy,dx,c) packed
    channels. Parameters keep the torch-parity (7,7,C,F) HWIO shape and the
    nn.Conv pytree names, so checkpoints and weight transfer are unchanged.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        fan_in = c * 49

        kernel = self.param(
            "kernel", torch_conv_kernel_init, (7, 7, c, self.features),
            self.param_dtype,
        )
        # Front-pad to 8x8 so K2[r, dy] = Kpad[2r + dy] covers a = 2r+dy-1
        # with K[-1] = 0, then interleave to the (dy, dx, c) packed order.
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k = k.reshape(4, 2, 4, 2, c, self.features)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        k = k.astype(self.dtype)

        xb = x.reshape(n, h // 2, 2, w // 2, 2, c)
        xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            xb.astype(self.dtype), k, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape, dtype: torch_conv_bias_init(key, shape, dtype, fan_in),
                (self.features,), self.param_dtype,
            )
            y = y + bias.astype(self.dtype)
        return y


class Conv(nn.Module):
    """nn.Conv2d equivalent: NHWC, HWIO kernels, torch default initialisation.

    The 7x7/2/pad-3 stem shape is auto-dispatched to the space-to-depth
    formulation (same math, ~12x faster on the MXU) when the input is
    even-sized; the parameter pytree is identical either way.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        fan_in = in_features * self.kernel_size * self.kernel_size

        if (
            (self.kernel_size, self.stride, self.padding, self.dilation)
            == (7, 2, 3, 1)
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            return _SpaceToDepthConv7(
                features=self.features,
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)

        def bias_init(key, shape, dtype):
            return torch_conv_bias_init(key, shape, dtype, fan_in)

        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


# Inference-only fast path for batch-stat eval: ONE fused HBM read for the
# (mean, var) statistics (pallas_kernels/bn_stats.py) instead of the
# two-pass read. The kernel has no VJP, so this is an explicit opt-in
# context for EVAL graphs only — training always uses the exact two-pass.
_FUSED_BN_STATS = False


@contextlib.contextmanager
def fused_bn_stats(enable: bool = True):
    """Trace batch-stat BN with the single-read fused statistics kernel.

    Usage: ``with fused_bn_stats(): jitted_eval(...)`` — the flag is read at
    TRACE time, so wrap the first (compiling) call. Eval-only (no autodiff
    through the stats kernel)."""
    global _FUSED_BN_STATS
    prev = _FUSED_BN_STATS
    _FUSED_BN_STATS = enable
    try:
        yield
    finally:
        _FUSED_BN_STATS = prev


class _TorchBatchNorm(nn.Module):
    """BatchNorm2d with torch's exact running-stat bookkeeping.

    ``flax.linen.BatchNorm`` EMAs the BIASED batch variance into the running
    stat; ``torch.nn.BatchNorm2d`` normalizes with the biased variance but
    EMAs the UNBIASED one (Bessel factor n/(n-1), n = batch*H*W[*replicas]).
    The reference trains and (for train.py/hourglass_compare.py) evaluates
    through torch BN (/root/reference/train.py:418-447), so running-average
    eval parity requires the torch update rule. Variable tree ("scale"/
    "bias" params, "mean"/"var" batch_stats) is identical to flax's, so
    existing checkpoints load unchanged.
    """

    use_running_average: bool = False
    axis_name: Optional[str] = None
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (feat,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), self.param_dtype))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), self.param_dtype))

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            n = 1
            for a in axes:
                n *= x.shape[a]
            if (_FUSED_BN_STATS and self.axis_name is None
                    and not self.is_initializing()
                    and x.ndim == 4 and x.shape[-1] % 128 == 0 and n >= 512):
                from ..pallas_kernels.bn_stats import bn_stats_fused

                mean, var = bn_stats_fused(x)
            else:
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axes)
                if self.axis_name is not None:
                    mean = jax.lax.pmean(mean, self.axis_name)
                    n = n * jax.lax.psum(1, self.axis_name)
                # Two-pass variance (torch's algorithm), NOT E[x^2]-E[x]^2:
                # the one-pass form cancels catastrophically in fp32 when
                # var << mean^2 (e.g. the ASPP global-pool branch where the
                # spatial extent is 1x1) and measurably breaks train-mode
                # parity with torch at small feature maps.
                d = xf - mean
                var = jnp.mean(jnp.square(d), axes)
                if self.axis_name is not None:
                    var = jax.lax.pmean(var, self.axis_name)
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1, 1))
                m = self.momentum
                ra_mean.value = ((1.0 - m) * ra_mean.value + m * mean).astype(
                    self.param_dtype)
                ra_var.value = ((1.0 - m) * ra_var.value + m * unbiased).astype(
                    self.param_dtype)

        # Normalize in the compute dtype (matching flax's cast-then-normalize
        # so the bf16 serving path fuses exactly as before).
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.epsilon)
        mul = (inv * scale.astype(jnp.float32)).astype(self.dtype)
        shift = (bias.astype(jnp.float32)
                 - mean.astype(jnp.float32) * inv * scale.astype(jnp.float32)
                 ).astype(self.dtype)
        return x.astype(self.dtype) * mul + shift


class BatchNorm(nn.Module):
    """torch-default BatchNorm2d (eps 1e-5, torch momentum 0.1, unbiased
    running-var update — see :class:`_TorchBatchNorm`)."""

    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _TorchBatchNorm(
            use_running_average=self.use_running_average,
            axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bn",
        )(x)


class ResidualBlock(nn.Module):
    """Final-model residual block (/root/reference/train.py:411-447).

    Pre-activation bottleneck: BN→ReLU→1x1(out/2)→BN→ReLU→3x3(out/2,
    stride)→BN→ReLU→1x1(out)→BN, skip = 1x1(stride, bias-free)+BN. The
    projection skip is taken unconditionally when ``always_project`` (the
    reference's effective behaviour — see module docstring).
    """

    features: int
    stride: int = 1
    always_project: bool = True
    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bnkw = dict(
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            **kw,
        )
        mid = self.features // 2
        residual = x
        in_features = x.shape[-1]

        y = BatchNorm(name="bn1", **bnkw)(x)
        y = nn.relu(y)
        y = Conv(mid, 1, 1, 0, name="conv1", **kw)(y)
        y = BatchNorm(name="bn2", **bnkw)(y)
        y = nn.relu(y)
        y = Conv(mid, 3, self.stride, 1, name="conv2", **kw)(y)
        y = BatchNorm(name="bn3", **bnkw)(y)
        y = nn.relu(y)
        y = Conv(self.features, 1, 1, 0, name="conv3", **kw)(y)
        out = BatchNorm(name="bn4", **bnkw)(y)

        if self.always_project or self.stride != 1 or in_features != self.features:
            residual = Conv(
                self.features, 1, self.stride, 0, use_bias=False, name="down_conv", **kw
            )(residual)
            residual = BatchNorm(name="down_bn", **bnkw)(residual)
        return out + residual


class ResidualBlockLite(nn.Module):
    """Early-variant residual block (/root/reference/only_one_hourgless.py:135-166).

    BN→ReLU→1x1(out/2)→BN→ReLU→3x3(out/2)→BN→ReLU→1x1(out); biased 1x1
    projection only when channel count changes; no trailing BN, no stride.
    """

    features: int
    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    # Inference fusion: at eval time, equal-channel blocks at 8²-16² spatial
    # run as ONE Pallas kernel (BN-folded affines + three MXU matmul groups
    # out of VMEM) instead of ~15 XLA ops — measured 3x faster at these
    # latency-bound sizes, while XLA's own conv fusion wins at ≥32²
    # (ROUND2_NOTES), hence the shape gate. Parameter pytree is unchanged;
    # numerics are the folded eval-mode math (rel err ≤0.7% bf16 on chip).
    fused_eval: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bnkw = dict(
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            **kw,
        )
        mid = self.features // 2
        residual = x
        in_features = x.shape[-1]

        if (
            self.fused_eval
            and self.use_running_average
            and not self.is_initializing()
            and in_features == self.features
            and x.ndim == 4
            and x.shape[1] == x.shape[2]
            and 8 <= x.shape[1] <= 16
        ):
            from ..pallas_kernels.fused_residual import (
                fold_lite_residual_params,
                lite_residual_pallas,
            )

            fp = fold_lite_residual_params(
                self.variables["params"], self.variables["batch_stats"],
                self.dtype,
            )
            # Interpret off-TPU so the CPU test mesh can execute the model.
            return lite_residual_pallas(
                x.astype(self.dtype), fp,
                interpret=jax.default_backend() != "tpu",
            )

        y = BatchNorm(name="bn1", **bnkw)(x)
        y = nn.relu(y)
        y = Conv(mid, 1, 1, 0, name="conv1", **kw)(y)
        y = BatchNorm(name="bn2", **bnkw)(y)
        y = nn.relu(y)
        y = Conv(mid, 3, 1, 1, name="conv2", **kw)(y)
        y = BatchNorm(name="bn3", **bnkw)(y)
        y = nn.relu(y)
        out = Conv(self.features, 1, 1, 0, name="conv3", **kw)(y)

        if in_features != self.features:
            residual = Conv(self.features, 1, 1, 0, name="conv4", **kw)(residual)
        return out + residual


class ConvBNReLU(nn.Module):
    """conv→BN→ReLU: the ``lin`` block (biased 1x1,
    /root/reference/only_one_hourgless.py:199-212) and, with ``use_bias=False``
    and dilation, the ``_ASPPModule`` (/root/reference/train.py:450-462).
    """

    features: int
    kernel_size: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = Conv(
            self.features,
            self.kernel_size,
            1,
            self.padding,
            dilation=self.dilation,
            use_bias=self.use_bias,
            name="conv",
            **kw,
        )(x)
        y = BatchNorm(
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            name="bn",
            **kw,
        )(y)
        return nn.relu(y)


class ASPPBlock(nn.Module):
    """ASPP bottleneck (/root/reference/train.py:465-495).

    Four parallel atrous branches over the same 256-ch input (1x1 d=1, 3x3
    d=6/12/18) plus a global-average-pool branch (1x1 conv, broadcast back to
    the spatial size via bilinear align_corners=True — which from a 1x1 source
    is a pure broadcast), concatenated to 1280 ch and fused by a bias-free 1x1.

    ``project_bn_relu``: the final model's fuse conv carries BN+ReLU
    (/root/reference/train.py:479-483) but the recursive-hourglass scripts
    use a bare conv (/root/reference/try_more_layer.py:269,290).
    """

    features: int = 256
    dilations: Sequence[int] = (1, 6, 12, 18)
    project_bn_relu: bool = True
    use_running_average: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(
            use_running_average=self.use_running_average,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        d1, d2, d3, d4 = self.dilations
        b1 = ConvBNReLU(self.features, 1, 0, d1, use_bias=False, name="aspp1", **kw)(x)
        b2 = ConvBNReLU(self.features, 3, d2, d2, use_bias=False, name="aspp2", **kw)(x)
        b3 = ConvBNReLU(self.features, 3, d3, d3, use_bias=False, name="aspp3", **kw)(x)
        b4 = ConvBNReLU(self.features, 3, d4, d4, use_bias=False, name="aspp4", **kw)(x)

        g = global_avg_pool(x)
        g = ConvBNReLU(self.features, 1, 0, 1, use_bias=False, name="global_branch", **kw)(g)
        g = resize_bilinear_align_corners(g, b4.shape[1], b4.shape[2])

        y = jnp.concatenate([b1, b2, b3, b4, g], axis=-1)
        if self.project_bn_relu:
            return ConvBNReLU(self.features, 1, 0, 1, use_bias=False, name="project", **kw)(y)
        return Conv(self.features, 1, 1, 0, use_bias=False, name="project",
                    dtype=self.dtype, param_dtype=self.param_dtype)(y)
