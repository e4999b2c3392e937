"""DCUNet: fully complex-valued U-Net score backbone (Interspeech 2022 model).

Capability parity with /root/reference/sgmse/backbones/dcunet.py:165-453 and the
complex-layer library in backbones/shared.py:60-123, re-designed for TPU:

- NHWC layout; complex convs follow the complex-multiplication rule
  F(a+ib) = f1(a) - f2(b) + i(f1(b) + f2(a)) (shared.py:94-123), computed as
  TWO real convs over a batch-stacked [real; imag] tensor (instead of four),
  which XLA maps to full-size MXU matmuls.
- Transposed convs are expressed directly as ``lax.conv_general_dilated`` with
  ``lhs_dilation`` (zero-stuffing); torch's dynamic ``output_size`` argument
  becomes a static output_padding computed at trace time.
- Four named architectures (DCUNet-10/16/20, DilDCUNet-v2 default) with the
  same encoder tables and automatic decoder inversion (dcunet.py:100-162).
- Norms: 'bN' (separate real/imag BatchNorm, running stats) and 'CbN'
  (complex whitening BatchNorm over the 2x2 covariance, batch stats only,
  dcunet.py:456-627).
- Time embedding: GFP or DiffusionStep, optionally complex, injected per
  block via FeatureMapDense (dcunet.py:223-242, 379-396).

Call contract (uniform across backbones in this framework):
``apply(variables, x_t, y, t, train=...)`` with complex (B, 1, F, T) inputs;
x_t and y are stacked into the 2 complex input channels (reference
model.py:308 does the concat outside; dcunet.py:202 sets input_channels=2).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .blocks import torch_conv_bias_init, torch_conv_default_init
from .registry import BackboneRegistry


def get_activation(name: str):
    if name == "silu":
        return jax.nn.silu
    elif name == "relu":
        return jax.nn.relu
    elif name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)
    raise NotImplementedError(f"Unknown activation: {name}")


def on_re_im(fn, x):
    """Apply a real function to real and imaginary parts (reference OnReIm)."""
    return jax.lax.complex(fn(x.real), fn(x.imag))


# ---------------------------------------------------------------------------------------
# Architecture tables (reference dcunet.py:100-162)
# ---------------------------------------------------------------------------------------

def _auto_pad(kernel_size, padding):
    return tuple(n // 2 for n in kernel_size) if padding == "auto" else tuple(padding)


def unet_decoder_args(encoders, *, skip_connections):
    """Decoder args for the upsampling side of a symmetric U-Net (dcunet.py:41-62)."""
    decoder_args = []
    for enc_in, enc_out, k, s, p, d in reversed(encoders):
        skip_in = enc_out if (skip_connections and decoder_args) else 0
        decoder_args.append((enc_out + skip_in, enc_in, k, s, p, d))
    return tuple(decoder_args)


def make_unet_encoder_decoder_args(encoder_args, decoder_args):
    encoder_args = tuple(
        (ic, oc, tuple(k), tuple(s), _auto_pad(k, p), tuple(d))
        for ic, oc, k, s, p, d in encoder_args)
    if decoder_args == "auto":
        decoder_args = unet_decoder_args(encoder_args, skip_connections=True)
    else:
        decoder_args = tuple(
            (ic, oc, tuple(k), tuple(s), _auto_pad(k, p), tuple(d), op)
            for ic, oc, k, s, p, d, op in decoder_args)
    return encoder_args, decoder_args


DCUNET_ARCHITECTURES = {
    "DCUNet-10": make_unet_encoder_decoder_args((
        (1, 32, (7, 5), (2, 2), "auto", (1, 1)),
        (32, 64, (7, 5), (2, 2), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
    ), "auto"),
    "DCUNet-16": make_unet_encoder_decoder_args((
        (1, 32, (7, 5), (2, 2), "auto", (1, 1)),
        (32, 32, (7, 5), (2, 1), "auto", (1, 1)),
        (32, 64, (7, 5), (2, 2), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
    ), "auto"),
    "DCUNet-20": make_unet_encoder_decoder_args((
        (1, 32, (7, 1), (1, 1), "auto", (1, 1)),
        (32, 32, (1, 7), (1, 1), "auto", (1, 1)),
        (32, 64, (7, 5), (2, 2), "auto", (1, 1)),
        (64, 64, (7, 5), (2, 1), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
        (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
        (64, 90, (5, 3), (2, 1), "auto", (1, 1)),
    ), "auto"),
    # architecture used in SGMSE / Interspeech paper
    "DilDCUNet-v2": make_unet_encoder_decoder_args((
        (1, 32, (4, 4), (1, 1), "auto", (1, 1)),
        (32, 32, (4, 4), (1, 1), "auto", (1, 1)),
        (32, 32, (4, 4), (1, 1), "auto", (1, 1)),
        (32, 64, (4, 4), (2, 1), "auto", (2, 1)),
        (64, 128, (4, 4), (2, 2), "auto", (4, 1)),
        (128, 256, (4, 4), (2, 2), "auto", (8, 1)),
    ), "auto"),
}


# ---------------------------------------------------------------------------------------
# Complex layers (NHWC)
# ---------------------------------------------------------------------------------------

class ComplexConv2d(nn.Module):
    """Complex conv via two real convs on a batch-stacked [re; im] tensor.

    ``dtype`` selects the compute precision of the real convs (the model's
    FLOP-dominant ops). There is no complex bfloat16, so mixed precision casts
    the stacked real tensor to ``dtype`` for the conv and recombines to
    complex64 afterwards; parameters stay float32.
    """
    out_ch: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        stacked = jnp.concatenate([x.real, x.imag], axis=0)
        if self.dtype is not None:
            stacked = stacked.astype(self.dtype)
        pad = [(self.padding[0],) * 2, (self.padding[1],) * 2]
        conv = partial(nn.Conv, self.out_ch, self.kernel_size, strides=self.strides,
                       padding=pad, kernel_dilation=self.dilation,
                       use_bias=self.use_bias, dtype=self.dtype,
                       kernel_init=torch_conv_default_init(),
                       bias_init=torch_conv_bias_init(
                           x.shape[-1] * self.kernel_size[0] * self.kernel_size[1]))
        f1 = conv(name="re")(stacked).astype(jnp.float32)   # f1(re), f1(im)
        f2 = conv(name="im")(stacked).astype(jnp.float32)   # f2(re), f2(im)
        f1r, f1i = f1[:b], f1[b:]
        f2r, f2i = f2[:b], f2[b:]
        return jax.lax.complex(f1r - f2i, f1i + f2r)


class ComplexConvTranspose2d(nn.Module):
    """Complex transposed conv; output size fixed statically via `output_shape`."""
    out_ch: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    output_padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Any = None

    def _transposed_real_conv(self, conv_name, stacked, output_padding):
        """Direct-form transposed conv: lhs_dilation + adjusted padding."""
        k = self.kernel_size
        d = self.dilation
        p = self.padding
        op = output_padding
        pad = [(d[i] * (k[i] - 1) - p[i], d[i] * (k[i] - 1) - p[i] + op[i])
               for i in range(2)]
        in_ch = stacked.shape[-1]
        w = self.param(f"{conv_name}_kernel", torch_conv_default_init(),
                       (k[0], k[1], in_ch, self.out_ch))
        # Transposed conv correlates with the flipped kernel.
        wf = jnp.flip(w, axis=(0, 1))
        if self.dtype is not None:
            stacked = stacked.astype(self.dtype)
            wf = wf.astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            stacked, wf, window_strides=(1, 1), padding=pad,
            lhs_dilation=self.strides, rhs_dilation=d,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out.astype(jnp.float32)
        if self.use_bias:
            bias = self.param(f"{conv_name}_bias",
                              torch_conv_bias_init(in_ch * k[0] * k[1]),
                              (self.out_ch,))
            out = out + bias
        return out

    @nn.compact
    def __call__(self, x, output_shape: Optional[Tuple[int, ...]] = None):
        b = x.shape[0]
        k, d, p, s = self.kernel_size, self.dilation, self.padding, self.strides
        op = self.output_padding
        if output_shape is not None:
            # torch's dynamic output_size: solve for output_padding statically
            # (extra rows/cols are *computed* by the kernel, not zero-filled).
            op = tuple(
                output_shape[1 + i]
                - ((x.shape[1 + i] - 1) * s[i] - 2 * p[i] + d[i] * (k[i] - 1) + 1)
                for i in range(2))
            for i in range(2):
                if not 0 <= op[i] < max(s[i], d[i]):
                    raise ValueError(
                        f"requested output size {output_shape[1 + i]} invalid for "
                        f"conv_transpose (computed output_padding {op[i]})")
        stacked = jnp.concatenate([x.real, x.imag], axis=0)
        f1 = self._transposed_real_conv("re", stacked, op)
        f2 = self._transposed_real_conv("im", stacked, op)
        f1r, f1i = f1[:b], f1[b:]
        f2r, f2i = f2[:b], f2[b:]
        return jax.lax.complex(f1r - f2i, f1i + f2r)


class ComplexLinear(nn.Module):
    """Complex dense layer (reference shared.py:60-75). Real inputs allowed."""
    features: int
    complex_valued: bool = True

    @nn.compact
    def __call__(self, x):
        dense = partial(nn.Dense, self.features,
                        kernel_init=torch_conv_default_init(),
                        bias_init=torch_conv_bias_init(x.shape[-1]))
        if not self.complex_valued:
            return dense(name="lin")(x)
        re = dense(name="re")
        im = dense(name="im")
        return jax.lax.complex(
            re(x.real) - im(x.imag),
            re(x.imag) + im(x.real))


class GaussianFourierProjectionComplex(nn.Module):
    """GFP with optional complex output (reference shared.py:13-34)."""
    embed_dim: int = 128
    scale: float = 16.0
    complex_valued: bool = False

    @nn.compact
    def __call__(self, t):
        dim = self.embed_dim if self.complex_valued else self.embed_dim // 2
        w = self.param("W", lambda key, shape: jax.random.normal(key, shape) * self.scale,
                       (dim,))
        w = jax.lax.stop_gradient(w)
        t_proj = t[:, None] * w[None, :] * 2.0 * math.pi
        if self.complex_valued:
            return jnp.exp(1j * t_proj)
        return jnp.concatenate([jnp.sin(t_proj), jnp.cos(t_proj)], axis=-1)


class DiffusionStepEmbedding(nn.Module):
    """DiffWave-style embedding (reference shared.py:37-57)."""
    embed_dim: int = 128
    complex_valued: bool = False

    @nn.compact
    def __call__(self, t):
        dim = self.embed_dim if self.complex_valued else self.embed_dim // 2
        fac = 10.0 ** (4.0 * jnp.arange(dim) / (dim - 1))
        inner = t[:, None] * fac[None, :]
        if self.complex_valued:
            return jnp.exp(1j * inner)
        return jnp.concatenate([jnp.sin(inner), jnp.cos(inner)], axis=-1)


class BatchNormOnReIm(nn.Module):
    """'bN' norm: separate real/imag BatchNorm with running stats
    (reference BatchNorm/_BatchNorm + OnReIm, dcunet.py:23-36)."""
    momentum: float = 0.9  # torch momentum 0.1 => flax momentum 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn_r = nn.BatchNorm(use_running_average=not train, momentum=self.momentum,
                            epsilon=self.epsilon, name="re")
        bn_i = nn.BatchNorm(use_running_average=not train, momentum=self.momentum,
                            epsilon=self.epsilon, name="im")
        return jax.lax.complex(bn_r(x.real), bn_i(x.imag))


class ComplexBatchNorm(nn.Module):
    """'CbN' norm: 2x2 covariance whitening (reference dcunet.py:456-627).

    The reference instantiates it with track_running_stats=False, so statistics
    are always computed from the batch (train and eval) — stateless here.
    """
    affine: bool = True
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # batch statistics in both modes
        c = x.shape[-1]
        xr, xi = x.real, x.imag
        red = tuple(i for i in range(x.ndim) if i != x.ndim - 1)
        mr = jnp.mean(xr, axis=red, keepdims=True)
        mi = jnp.mean(xi, axis=red, keepdims=True)
        xr, xi = xr - mr, xi - mi
        vrr = jnp.mean(xr * xr, axis=red, keepdims=True) + self.epsilon
        vri = jnp.mean(xr * xi, axis=red, keepdims=True)
        vii = jnp.mean(xi * xi, axis=red, keepdims=True) + self.epsilon
        # inverse square root of the 2x2 covariance
        tau = vrr + vii
        delta = vrr * vii - vri * vri
        s = jnp.sqrt(delta)
        t = jnp.sqrt(tau + 2 * s)
        rst = 1.0 / (s * t)
        urr = (s + vii) * rst
        uii = (s + vrr) * rst
        uri = -vri * rst
        if self.affine:
            wrr = self.param("Wrr", jax.nn.initializers.ones, (c,))
            wri = self.param("Wri",
                             lambda key, shape: jax.random.uniform(key, shape,
                                                                   minval=-0.9, maxval=0.9),
                             (c,))
            wii = self.param("Wii", jax.nn.initializers.ones, (c,))
            br = self.param("Br", jax.nn.initializers.zeros, (c,))
            bi = self.param("Bi", jax.nn.initializers.zeros, (c,))
            zrr = wrr * urr + wri * uri
            zri = wrr * uri + wri * uii
            zir = wri * urr + wii * uri
            zii = wri * uri + wii * uii
            yr = zrr * xr + zri * xi + br
            yi = zir * xr + zii * xi + bi
        else:
            yr = urr * xr + uri * xi
            yi = uri * xr + uii * xi
        return jax.lax.complex(yr, yi)


class TimeEmbedLayer(nn.Module):
    """Per-block time-embedding projection: optional extra complex linears, then
    FeatureMapDense + activation (reference dcunet.py:379-396)."""
    embed_dim: int
    out_ch: int
    temb_layers: int
    temb_activation: str

    @nn.compact
    def __call__(self, t_embed):
        act = get_activation(self.temb_activation)
        h = t_embed
        for i in range(max(0, self.temb_layers - 1)):
            h = ComplexLinear(self.embed_dim, complex_valued=True, name=f"lin{i}")(h)
            h = on_re_im(act, h)
        h = ComplexLinear(self.out_ch, complex_valued=True, name="feature_dense")(h)
        h = h[:, None, None, :]  # FeatureMapDense: broadcast over (H, W)
        return on_re_im(act, h)


class DCUNetComplexEncoderBlock(nn.Module):
    out_ch: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[int, int]
    dilation: Tuple[int, int]
    norm_type: str = "bN"
    activation: str = "leaky_relu"
    embed_dim: Optional[int] = None
    temb_layers: int = 1
    temb_activation: str = "silu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, t_embed, train: bool = False):
        y = ComplexConv2d(self.out_ch, self.kernel_size, self.strides, self.padding,
                          self.dilation, use_bias=self.norm_type is None,
                          dtype=self.dtype, name="conv")(x)
        if self.embed_dim is not None and t_embed is not None:
            y = y + TimeEmbedLayer(self.embed_dim, self.out_ch, self.temb_layers,
                                   self.temb_activation, name="embed_layer")(t_embed)
        norm = (ComplexBatchNorm if self.norm_type == "CbN" else BatchNormOnReIm)
        y = norm(name="norm")(y, train=train)
        return on_re_im(get_activation(self.activation), y)


class DCUNetComplexDecoderBlock(nn.Module):
    out_ch: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[int, int]
    dilation: Tuple[int, int]
    output_padding: Tuple[int, int] = (0, 0)
    norm_type: str = "bN"
    activation: str = "leaky_relu"
    embed_dim: Optional[int] = None
    temb_layers: int = 1
    temb_activation: str = "silu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, t_embed, output_shape=None, train: bool = False):
        y = ComplexConvTranspose2d(self.out_ch, self.kernel_size, self.strides,
                                   self.padding, self.output_padding, self.dilation,
                                   use_bias=self.norm_type is None,
                                   dtype=self.dtype,
                                   name="deconv")(x, output_shape=output_shape)
        if self.embed_dim is not None and t_embed is not None:
            y = y + TimeEmbedLayer(self.embed_dim, self.out_ch, self.temb_layers,
                                   self.temb_activation, name="embed_layer")(t_embed)
        norm = (ComplexBatchNorm if self.norm_type == "CbN" else BatchNormOnReIm)
        y = norm(name="norm")(y, train=train)
        return on_re_im(get_activation(self.activation), y)


# ---------------------------------------------------------------------------------------
# DCUNet backbone
# ---------------------------------------------------------------------------------------

@BackboneRegistry.register("dcunet")
class DCUNet(nn.Module):
    """Complex U-Net score backbone. See module docstring."""
    dcunet_architecture: str = "DilDCUNet-v2"
    dcunet_time_embedding: str = "gfp"
    dcunet_temb_layers_global: int = 2
    dcunet_temb_layers_local: int = 1
    dcunet_temb_activation: str = "silu"
    dcunet_time_embedding_complex: bool = False
    dcunet_fix_length: str = "pad"
    dcunet_mask_bound: str = "none"
    dcunet_norm_type: str = "bN"
    dcunet_activation: str = "relu"
    embed_dim: int = 128
    # Mixed precision: "float32" or "bfloat16". Parameters and norm statistics
    # (bN running stats, CbN whitening covariance) are always float32; the
    # compute dtype applies to the complex convs' underlying real convs.
    precision: str = "float32"

    @property
    def compute_dtype(self):
        if self.precision in ("bfloat16", "bf16"):
            return jnp.bfloat16
        if self.precision in ("float32", "fp32", "f32"):
            return None
        raise ValueError(f"Unknown precision: {self.precision}")

    @staticmethod
    def add_argparse_args(parser):
        parser.add_argument("--dcunet-architecture", dest="dcunet_architecture",
                            type=str, default="DilDCUNet-v2",
                            choices=DCUNET_ARCHITECTURES.keys(),
                            help="The concrete DCUNet architecture. 'DilDCUNet-v2' by default.")
        parser.add_argument("--dcunet-time-embedding", dest="dcunet_time_embedding",
                            type=str, choices=("gfp", "ds", "none"), default="gfp",
                            help="Timestep embedding style. 'gfp' by default.")
        parser.add_argument("--dcunet-temb-layers-global", dest="dcunet_temb_layers_global",
                            type=int, default=1,
                            help="Number of global linear+activation layers for the time embedding. 1 by default.")
        parser.add_argument("--dcunet-temb-layers-local", dest="dcunet_temb_layers_local",
                            type=int, default=1,
                            help="Number of local (per-encoder/per-decoder) linear+activation layers for the time embedding. 1 by default.")
        parser.add_argument("--dcunet-temb-activation", dest="dcunet_temb_activation",
                            type=str, default="silu",
                            help="The (complex) activation to use between all (global&local) time embedding layers.")
        parser.add_argument("--dcunet-time-embedding-complex", dest="dcunet_time_embedding_complex",
                            action="store_true",
                            help="Use complex-valued timestep embedding.")
        parser.add_argument("--dcunet-fix-length", dest="dcunet_fix_length",
                            type=str, default="pad", choices=("pad", "trim", "none"),
                            help="DCUNet strategy to 'fix' mismatched input timespan.")
        parser.add_argument("--dcunet-mask-bound", dest="dcunet_mask_bound",
                            type=str, choices=("tanh", "sigmoid", "none"), default="none",
                            help="DCUNet output bounding strategy. 'none' by default.")
        parser.add_argument("--dcunet-norm-type", dest="dcunet_norm_type",
                            type=str, choices=("bN", "CbN"), default="bN",
                            help="The type of norm to use within each encoder and decoder layer.")
        parser.add_argument("--dcunet-activation", dest="dcunet_activation",
                            type=str, choices=("leaky_relu", "relu", "silu"),
                            default="leaky_relu",
                            help="The activation to use within each encoder and decoder layer.")
        parser.add_argument("--precision", type=str, default="float32",
                            choices=("float32", "bfloat16"),
                            help="Compute dtype for the complex convs (params stay float32).")
        return parser

    @property
    def encoders_stride_product(self):
        conf_encoders, _ = DCUNET_ARCHITECTURES[self.dcunet_architecture]
        return np.prod([s for _, _, _, s, _, _ in conf_encoders], axis=0)

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, y: jnp.ndarray, t: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        if self.dcunet_mask_bound != "none":
            raise NotImplementedError("mask bounding not implemented (parity with reference dcunet.py:251)")

        input_channels = 2  # x_t and y as complex channels (dcunet.py:202)
        conf_encoders, conf_decoders = DCUNET_ARCHITECTURES[self.dcunet_architecture]
        _, *rest = conf_encoders[0]
        encoders_args = ((input_channels, *rest), *conf_encoders[1:])
        decoders_args = conf_decoders

        # NCHW complex (B, 1, F, T) pair -> NHWC complex (B, F, T, 2)
        spec = jnp.concatenate([x_t, y], axis=1)  # (B, 2, F, T)
        x_in = jnp.transpose(spec, (0, 2, 3, 1))

        # ---- fix input dims (reference dcunet.py:301-326) ---------------------------
        fix_mode = None if self.dcunet_fix_length == "none" else self.dcunet_fix_length
        freq_prod, time_prod = (int(v) for v in self.encoders_stride_product)
        if (x_in.shape[1] - 1) % freq_prod:
            raise TypeError(
                f"Input shape must be [batch, ch, freq + 1, time + 1] with freq divisible "
                f"by {freq_prod}, got {spec.shape} instead")
        time_remainder = (x_in.shape[2] - 1) % time_prod
        if time_remainder:
            if fix_mode is None:
                raise TypeError(
                    f"Input shape must be [batch, ch, freq + 1, time + 1] with time "
                    f"divisible by {time_prod}, got {spec.shape} instead. Set "
                    f"'dcunet_fix_length' to 'pad' or 'trim' to fix shapes automatically.")
            elif fix_mode == "pad":
                x_in = jnp.pad(x_in, [(0, 0), (0, 0), (0, time_prod - time_remainder), (0, 0)])
            else:  # trim
                x_in = x_in[:, :, :x_in.shape[2] - time_remainder, :]

        # ---- global time embedding (reference dcunet.py:223-242) --------------------
        t_embed = None
        if self.dcunet_time_embedding != "none":
            complex_valued = self.dcunet_time_embedding_complex
            tc = t.astype(jnp.complex64)
            if self.dcunet_time_embedding == "gfp":
                t_embed = GaussianFourierProjectionComplex(
                    embed_dim=self.embed_dim, complex_valued=complex_valued,
                    name="embed_gfp")(tc)
            elif self.dcunet_time_embedding == "ds":
                t_embed = DiffusionStepEmbedding(
                    embed_dim=self.embed_dim, complex_valued=complex_valued,
                    name="embed_ds")(tc)
            t_embed = t_embed.astype(jnp.complex64)
            act = get_activation(self.dcunet_temb_activation)
            for i in range(self.dcunet_temb_layers_global):
                t_embed = ComplexLinear(self.embed_dim, complex_valued=True,
                                        name=f"embed_global{i}")(t_embed)
                t_embed = on_re_im(act, t_embed)

        common = dict(norm_type=self.dcunet_norm_type,
                      activation=self.dcunet_activation,
                      temb_layers=self.dcunet_temb_layers_local,
                      temb_activation=self.dcunet_temb_activation,
                      embed_dim=(self.embed_dim
                                 if self.dcunet_time_embedding != "none" else None),
                      dtype=self.compute_dtype)

        # ---- encoder / decoder stacks (reference dcunet.py:278-290) -----------------
        x = x_in
        enc_outs = []
        for idx, (ic, oc, k, s, p, d) in enumerate(encoders_args):
            x = DCUNetComplexEncoderBlock(
                out_ch=oc, kernel_size=k, strides=s, padding=p, dilation=d,
                name=f"encoder{idx}", **common)(x, t_embed, train=train)
            enc_outs.append(x)

        for idx, (enc_out, dec_args) in enumerate(
                zip(reversed(enc_outs[:-1]), decoders_args[:-1])):
            ic, oc, k, s, p, d = dec_args[:6]
            x = DCUNetComplexDecoderBlock(
                out_ch=oc, kernel_size=k, strides=s, padding=p, dilation=d,
                name=f"decoder{idx}", **common)(
                x, t_embed, output_shape=enc_out.shape, train=train)
            x = jnp.concatenate([x, enc_out], axis=-1)

        ic, oc, k, s, p, d = decoders_args[-1][:6]
        out = ComplexConvTranspose2d(
            out_ch=oc, kernel_size=k, strides=s, padding=p, dilation=d,
            dtype=self.compute_dtype,
            name="output_layer")(x, output_shape=x_in.shape)

        # ---- fix output dims back to the input timespan (dcunet.py:329-333) ---------
        target_t = spec.shape[3]
        cur_t = out.shape[2]
        if cur_t < target_t:
            out = jnp.pad(out, [(0, 0), (0, 0), (0, target_t - cur_t), (0, 0)])
        elif cur_t > target_t:
            out = out[:, :, :target_t, :]

        # NHWC (B, F, T, 1) -> (B, 1, F, T)
        return jnp.transpose(out, (0, 3, 1, 2)).astype(jnp.complex64)
