"""NN layer library for the NCSN++ backbones, in Flax (linen) and NHWC layout.

Functional re-design of the reference layer library
(/root/reference/sgmse/backbones/ncsnpp_utils/{layers.py,layerspp.py}): same math,
TPU-native layout (NHWC so convs tile onto the MXU without transposes), explicit
module names for stable parameter paths, FIR resampling via the fused upfirdn2d op.

Initializers follow the DDPM convention: variance_scaling(scale, fan_avg, uniform)
with scale 1e-10 when init_scale == 0 (reference layers.py:54-91).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import upfirdn2d as ufd


def get_act(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry (reference layers.py:29-41)."""
    if name == "elu":
        return jax.nn.elu
    elif name == "relu":
        return jax.nn.relu
    elif name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    elif name == "swish":
        return jax.nn.silu
    raise NotImplementedError(f"activation function {name} does not exist!")


def ddpm_init(scale: float = 1.0):
    """DDPM default init: fan_avg uniform variance scaling; 0 means 1e-10."""
    scale = 1e-10 if scale == 0 else scale
    return jax.nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def torch_conv_default_init():
    """Matches torch.nn.Conv2d's default kaiming-uniform(a=sqrt(5)) => U(+-1/sqrt(fan_in))."""
    return jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_conv_bias_init(fan_in: int):
    """torch.nn.Conv2d default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class Conv3x3(nn.Module):
    """3x3 conv with DDPM init (reference layers.py:118-124). NHWC."""
    out_ch: int
    stride: int = 1
    use_bias: bool = True
    dilation: int = 1
    init_scale: float = 1.0
    padding: Any = 1
    dtype: Any = None  # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        return nn.Conv(
            self.out_ch, (3, 3), strides=(self.stride, self.stride),
            padding=pad, kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=ddpm_init(self.init_scale),
            bias_init=jax.nn.initializers.zeros,
        )(x)


class Conv1x1(nn.Module):
    """1x1 conv with DDPM init (reference layers.py:100-105). NHWC."""
    out_ch: int
    stride: int = 1
    use_bias: bool = True
    init_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out_ch, (1, 1), strides=(self.stride, self.stride),
            padding="VALID", use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=ddpm_init(self.init_scale),
            bias_init=jax.nn.initializers.zeros,
        )(x)


class NIN(nn.Module):
    """Network-in-network 1x1 projection via channel contraction (reference layers.py:546-555)."""
    num_units: int
    init_scale: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("W", ddpm_init(self.init_scale), (in_dim, self.num_units))
        b = self.param("b", jax.nn.initializers.zeros, (self.num_units,))
        if self.dtype is not None:
            x, w, b = x.astype(self.dtype), w.astype(self.dtype), b.astype(self.dtype)
        return jnp.einsum("...c,cd->...d", x, w) + b


class DDPMDense(nn.Module):
    """Dense layer with DDPM init and zero bias (used for temb projections)."""
    features: int
    init_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features, dtype=self.dtype,
            kernel_init=ddpm_init(self.init_scale),
            bias_init=jax.nn.initializers.zeros,
        )(x)


class GroupNormBF16Stats(nn.Module):
    """ABLATION-ONLY GroupNorm with statistics computed in the compute dtype
    (bf16) instead of flax's internal float32 upcast. Used by
    `tools/train_mfu.py --ablate gn_bf16_stats` to price the f32-stat
    reductions in the training backward pass (VERDICT r4 next #9). Parameter
    names/shapes match nn.GroupNorm ("scale"/"bias"), so the same parameter
    tree initializes either implementation."""
    num_groups: int
    epsilon: float = 1e-6
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype or x.dtype
        c = x.shape[-1]
        scale = self.param("scale", jax.nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", jax.nn.initializers.zeros, (c,), jnp.float32)
        xr = x.astype(dt).reshape(*x.shape[:-1], self.num_groups,
                                  c // self.num_groups)
        red = tuple(range(1, xr.ndim - 2)) + (xr.ndim - 1,)
        mean = xr.mean(axis=red, keepdims=True)
        var = ((xr - mean) ** 2).mean(axis=red, keepdims=True)
        xn = ((xr - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(x.shape)
        return xn * scale.astype(dt) + bias.astype(dt)


def group_norm(ch: int, dtype: Any = None, name: Optional[str] = None):
    """GroupNorm(min(ch//4, 32), eps=1e-6) as used throughout NCSN++ (layerspp.py:67).

    With a bf16 compute dtype, flax still computes the normalization statistics
    in float32 internally, so the reduction stays numerically stable. Setting
    SGMSE_TPU_GN_STATS_BF16=1 swaps in GroupNormBF16Stats (throughput ablation
    only — do not train real checkpoints with it)."""
    import os
    cls = (GroupNormBF16Stats
           if os.environ.get("SGMSE_TPU_GN_STATS_BF16") == "1" else nn.GroupNorm)
    return cls(num_groups=min(ch // 4, 32), epsilon=1e-6, dtype=dtype, name=name)


class GaussianFourierProjection(nn.Module):
    """Gaussian Fourier features of the (log-)time (reference layerspp.py:32-41).

    W is a fixed random projection: stored as a parameter for checkpoint
    round-tripping but stop-gradient'd so it never trains.
    """
    embedding_size: int = 256
    scale: float = 16.0

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embedding_size,),
        )
        w = jax.lax.stop_gradient(w)
        x_proj = x[:, None] * w[None, :] * 2.0 * math.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


def get_timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int,
                           max_positions: int = 10000) -> jnp.ndarray:
    """Sinusoidal positional embedding (reference layers.py:515-529)."""
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class Combine(nn.Module):
    """Combine a pyramid skip with the trunk: 1x1 conv then sum/concat (layerspp.py:44-59)."""
    dim2: int
    method: str = "cat"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, y):
        h = Conv1x1(self.dim2, dtype=self.dtype, name="Conv_0")(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        elif self.method == "sum":
            return h + y
        raise ValueError(f"Method {self.method} not recognized.")


class AttnBlockpp(nn.Module):
    """Self-attention over the full (H, W) token grid (reference layerspp.py:62-91).

    NHWC: tokens are the H*W spatial positions, single head, scale C^-0.5.
    """
    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = group_norm(c, dtype=self.dtype, name="GroupNorm_0")(x)
        q = NIN(c, dtype=self.dtype, name="NIN_0")(hn)
        k = NIN(c, dtype=self.dtype, name="NIN_1")(hn)
        v = NIN(c, dtype=self.dtype, name="NIN_2")(hn)

        q = q.reshape(b, h * w, c)
        k = k.reshape(b, h * w, c)
        v = v.reshape(b, h * w, c)
        logits = jnp.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5)
        # Softmax in float32 for stability regardless of compute dtype.
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        weights = weights.astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", weights, v).reshape(b, h, w, c)
        out = NIN(c, init_scale=self.init_scale, dtype=self.dtype, name="NIN_3")(out)
        if not self.skip_rescale:
            return x + out
        return (x + out) / math.sqrt(2.0)


class FIRConv2d(nn.Module):
    """Conv2d fused with FIR up/down-sampling (reference up_or_down_sampling.py:23-56). NHWC."""
    out_ch: int
    kernel: int = 3
    up: bool = False
    down: bool = False
    resample_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        assert not (self.up and self.down)
        assert self.kernel >= 1 and self.kernel % 2 == 1
        init = self.kernel_init if self.kernel_init is not None else jax.nn.initializers.zeros
        w = self.param("weight", init, (self.kernel, self.kernel, x.shape[-1], self.out_ch))
        if self.dtype is not None:
            x, w = x.astype(self.dtype), w.astype(self.dtype)
        if self.up:
            x = ufd.upsample_conv_2d(x, w, k=self.resample_kernel)
        elif self.down:
            x = ufd.conv_downsample_2d(x, w, k=self.resample_kernel)
        else:
            x = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=(1, 1),
                padding=[(self.kernel // 2,) * 2] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", jax.nn.initializers.zeros, (self.out_ch,))
            x = x + (b.astype(self.dtype) if self.dtype is not None else b)
        return x


class Upsample(nn.Module):
    """2x upsampling, FIR or nearest, optional conv (reference layerspp.py:94-126). NHWC."""
    in_ch: Optional[int] = None
    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_ch if self.out_ch else x.shape[-1]
        if not self.fir:
            b, h, w, c = x.shape
            hh = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            if self.with_conv:
                hh = Conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(hh)
        else:
            if not self.with_conv:
                hh = ufd.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                hh = FIRConv2d(out_ch, kernel=3, up=True,
                               resample_kernel=self.fir_kernel, use_bias=True,
                               kernel_init=ddpm_init(), dtype=self.dtype,
                               name="Conv2d_0")(x)
        return hh


class Downsample(nn.Module):
    """2x downsampling, FIR or pool, optional conv (reference layerspp.py:129-163). NHWC."""
    in_ch: Optional[int] = None
    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_ch if self.out_ch else x.shape[-1]
        if not self.fir:
            if self.with_conv:
                x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
                x = Conv3x3(out_ch, stride=2, padding=0, dtype=self.dtype,
                            name="Conv_0")(x)
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        else:
            if not self.with_conv:
                x = ufd.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                x = FIRConv2d(out_ch, kernel=3, down=True,
                              resample_kernel=self.fir_kernel, use_bias=True,
                              kernel_init=ddpm_init(), dtype=self.dtype,
                              name="Conv2d_0")(x)
        return x


class ResnetBlockDDPMpp(nn.Module):
    """DDPM-style residual block (reference layerspp.py:166-209). NHWC."""
    act: Callable
    in_ch: int
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    temb_dim: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        out_ch = self.out_ch if self.out_ch else self.in_ch
        h = self.act(group_norm(self.in_ch, dtype=self.dtype,
                              name="GroupNorm_0")(x))
        h = Conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(h)
        if temb is not None:
            h = h + DDPMDense(out_ch, dtype=self.dtype,
                              name="Dense_0")(self.act(temb))[:, None, None, :]
        h = self.act(group_norm(out_ch, dtype=self.dtype,
                              name="GroupNorm_1")(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = Conv3x3(out_ch, init_scale=self.init_scale, dtype=self.dtype,
                    name="Conv_1")(h)
        if x.shape[-1] != out_ch:
            if self.conv_shortcut:
                x = Conv3x3(out_ch, dtype=self.dtype, name="Conv_2")(x)
            else:
                x = NIN(out_ch, dtype=self.dtype, name="NIN_0")(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)


class ResnetBlockBigGANpp(nn.Module):
    """BigGAN-style residual block with optional FIR up/down (reference layerspp.py:212-274)."""
    act: Callable
    in_ch: int
    out_ch: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    temb_dim: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        out_ch = self.out_ch if self.out_ch else self.in_ch
        h = self.act(group_norm(self.in_ch, dtype=self.dtype,
                              name="GroupNorm_0")(x))

        if self.up:
            if self.fir:
                h = ufd.upsample_2d(h, self.fir_kernel, factor=2)
                x = ufd.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = ufd.naive_upsample_2d(h, factor=2)
                x = ufd.naive_upsample_2d(x, factor=2)
        elif self.down:
            if self.fir:
                h = ufd.downsample_2d(h, self.fir_kernel, factor=2)
                x = ufd.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = ufd.naive_downsample_2d(h, factor=2)
                x = ufd.naive_downsample_2d(x, factor=2)

        h = Conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(h)
        if temb is not None:
            h = h + DDPMDense(out_ch, dtype=self.dtype,
                              name="Dense_0")(self.act(temb))[:, None, None, :]
        h = self.act(group_norm(out_ch, dtype=self.dtype,
                              name="GroupNorm_1")(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = Conv3x3(out_ch, init_scale=self.init_scale, dtype=self.dtype,
                    name="Conv_1")(h)

        if self.in_ch != out_ch or self.up or self.down:
            x = Conv1x1(out_ch, dtype=self.dtype, name="Conv_2")(x)

        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)
