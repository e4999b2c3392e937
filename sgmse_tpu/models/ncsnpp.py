"""NCSN++ score-network backbones (ncsnpp, ncsnpp_v2, ncsnpp_48k) in Flax/NHWC.

Functional TPU-native re-design of the reference U-Net
(/root/reference/sgmse/backbones/ncsnpp.py:36-419, ncsnpp_v2.py:36-395,
ncsnpp_48k.py:36-424). All three reference variants are the same 7-level
BigGAN-res-block U-Net with different defaults and two small forward-pass
differences, so they share one implementation here:

- ``ncsnpp``      : progressive output_skip/input_skip pyramids, attention at
                    frequency-resolution 16, output scaled by 1/t (``scale_by_sigma``),
                    output 1x1 conv applied after the scaling.
- ``ncsnpp_v2``   : same U-Net, no sigma-scaling/centering; preconditioning lives
                    in the ScoreModel (c_in/c_out/c_skip), output not negated.
- ``ncsnpp_48k``  : attention-free, no progressive pyramids, output conv applied
                    before sigma-scaling (reference ncsnpp_48k.py:414-424).

Layout: complex spectrogram inputs ``x_t``/``y`` of shape (B, 1, F, T) are
unpacked into a real NHWC tensor (B, F, T, 4) = [x.re, x.im, y.re, y.im]
(reference ncsnpp.py:262-263); F plays the role of the image H axis, so the
attention trigger ``h.shape[-2] == 16`` of the reference becomes
``h.shape[1] == 16`` here (reference ncsnpp.py:308 checks the frequency axis).

The call contract is uniform across all backbones in this framework:
``apply(variables, x_t, y, t, train=...) -> complex (B, 1, F, T)``.
Sign conventions (the legacy ``score = -dnn(...)``) are applied by the
ScoreModel, matching reference model.py:306-310.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import blocks
from .registry import BackboneRegistry
from .blocks import (
    AttnBlockpp, Combine, Conv1x1, Conv3x3, DDPMDense, Downsample,
    GaussianFourierProjection, ResnetBlockBigGANpp, ResnetBlockDDPMpp, Upsample,
    ddpm_init, get_act, get_timestep_embedding, torch_conv_default_init,
)


class NCSNppBase(nn.Module):
    """Shared NCSN++ U-Net. See module docstring for variant mapping."""

    scale_by_sigma: bool = True
    nonlinearity: str = "swish"
    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    resamp_with_conv: bool = True
    conditional: bool = True
    fir: bool = True
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    progressive: str = "output_skip"
    progressive_input: str = "input_skip"
    progressive_combine: str = "sum"
    init_scale: float = 0.0
    fourier_scale: float = 16.0
    image_size: int = 256
    embedding_type: str = "fourier"
    dropout: float = 0.0
    centered: bool = True
    # Variant switches (not reference flags):
    output_layer_before_sigma: bool = False  # True for ncsnpp_48k
    # Mixed precision: "float32" or "bfloat16". Parameters are always stored
    # float32; bfloat16 selects the compute dtype so convs/matmuls hit the
    # MXU at double rate (softmax and GroupNorm statistics stay float32).
    precision: str = "float32"
    # Rematerialization: recompute res-block activations in the backward pass
    # instead of storing them (jax.checkpoint / flax nn.remat), trading ~30%
    # more FLOPs for a large activation-memory saving — the TPU-native answer
    # to long 48 kHz utterances instead of gradient checkpoint hacks.
    remat: bool = False

    @property
    def compute_dtype(self):
        if self.precision in ("bfloat16", "bf16"):
            return jnp.bfloat16
        if self.precision in ("float32", "fp32", "f32"):
            return None
        raise ValueError(f"Unknown precision: {self.precision}")

    def _resblock(self, act, in_ch, out_ch=None, up=False, down=False, name=None):
        biggan_cls, ddpm_cls = ResnetBlockBigGANpp, ResnetBlockDDPMpp
        if self.remat:
            # flax remat traces core_fn(module, x, temb, train): `train`
            # sits at index 3 and must be static (it gates nn.Dropout).
            biggan_cls = nn.remat(biggan_cls, static_argnums=(3,))
            ddpm_cls = nn.remat(ddpm_cls, static_argnums=(3,))
        if self.resblock_type == "biggan":
            return biggan_cls(
                act=act, in_ch=in_ch, out_ch=out_ch, up=up, down=down,
                dropout=self.dropout, fir=self.fir, fir_kernel=self.fir_kernel,
                skip_rescale=self.skip_rescale, init_scale=self.init_scale,
                temb_dim=self.nf * 4, dtype=self.compute_dtype, name=name)
        elif self.resblock_type == "ddpm":
            return ddpm_cls(
                act=act, in_ch=in_ch, out_ch=out_ch, dropout=self.dropout,
                skip_rescale=self.skip_rescale, init_scale=self.init_scale,
                temb_dim=self.nf * 4, dtype=self.compute_dtype, name=name)
        raise ValueError(f"resblock type {self.resblock_type} unrecognized.")

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, y: jnp.ndarray, t: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        assert self.progressive in ("none", "output_skip", "residual")
        assert self.progressive_input in ("none", "input_skip", "residual")
        assert self.embedding_type in ("fourier", "positional")
        act = get_act(self.nonlinearity)
        nf = self.nf
        dt = self.compute_dtype
        num_resolutions = len(self.ch_mult)
        combine_method = self.progressive_combine.lower()

        # Complex (B, 1, F, T) pair -> real NHWC (B, F, T, 4).
        x = jnp.stack(
            [x_t[:, 0].real, x_t[:, 0].imag, y[:, 0].real, y[:, 0].imag], axis=-1
        ).astype(dt if dt is not None else jnp.float32)
        num_channels = 4

        # --- time embedding -----------------------------------------------------------
        if self.embedding_type == "fourier":
            used_sigmas = t
            temb = GaussianFourierProjection(
                embedding_size=nf, scale=self.fourier_scale, name="fourier")(jnp.log(t))
        else:  # positional
            used_sigmas = t
            temb = get_timestep_embedding(t, nf)

        if self.conditional:
            temb = DDPMDense(nf * 4, dtype=dt, name="temb_dense0")(temb)
            temb = DDPMDense(nf * 4, dtype=dt, name="temb_dense1")(act(temb))
        else:
            temb = None

        if not self.centered:
            x = 2.0 * x - 1.0

        # --- down path ----------------------------------------------------------------
        input_pyramid = x if self.progressive_input != "none" else None
        hs = [Conv3x3(nf, dtype=dt, name="conv_in")(x)]
        in_ch = nf

        for i_level in range(num_resolutions):
            for i_block in range(self.num_res_blocks):
                out_ch = nf * self.ch_mult[i_level]
                h = self._resblock(act, in_ch, out_ch,
                                   name=f"down_{i_level}_block{i_block}")(
                    hs[-1], temb, train)
                in_ch = out_ch
                if h.shape[1] in self.attn_resolutions:
                    h = AttnBlockpp(skip_rescale=self.skip_rescale,
                                    init_scale=self.init_scale, dtype=dt,
                                    name=f"down_{i_level}_attn{i_block}")(h)
                hs.append(h)

            if i_level != num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    h = Downsample(with_conv=self.resamp_with_conv, fir=self.fir,
                                   fir_kernel=self.fir_kernel, dtype=dt,
                                   name=f"down_{i_level}_downsample")(hs[-1])
                else:
                    h = self._resblock(act, in_ch, down=True,
                                       name=f"down_{i_level}_downres")(
                        hs[-1], temb, train)

                if self.progressive_input == "input_skip":
                    # Progressive input pyramid: FIR-downsample the raw input and
                    # merge (reference ncsnpp.py:322-325).
                    input_pyramid = blocks.ufd.downsample_2d(
                        input_pyramid, self.fir_kernel, factor=2) if self.fir else \
                        blocks.ufd.naive_downsample_2d(input_pyramid, factor=2)
                    h = Combine(dim2=in_ch, method=combine_method, dtype=dt,
                                name=f"down_{i_level}_combine")(input_pyramid, h)
                    if combine_method == "cat":
                        in_ch *= 2
                elif self.progressive_input == "residual":
                    input_pyramid = Downsample(
                        out_ch=in_ch, with_conv=True, fir=self.fir,
                        fir_kernel=self.fir_kernel, dtype=dt,
                        name=f"down_{i_level}_pyramid_down")(input_pyramid)
                    if self.skip_rescale:
                        input_pyramid = (input_pyramid + h) / math.sqrt(2.0)
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        # --- middle -------------------------------------------------------------------
        h = hs[-1]
        h = self._resblock(act, in_ch, name="mid_block0")(h, temb, train)
        h = AttnBlockpp(skip_rescale=self.skip_rescale, init_scale=self.init_scale,
                        dtype=dt, name="mid_attn")(h)
        h = self._resblock(act, in_ch, name="mid_block1")(h, temb, train)

        # --- up path ------------------------------------------------------------------
        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                out_ch = nf * self.ch_mult[i_level]
                skip = hs.pop()
                h = self._resblock(act, h.shape[-1] + skip.shape[-1], out_ch,
                                   name=f"up_{i_level}_block{i_block}")(
                    jnp.concatenate([h, skip], axis=-1), temb, train)
                in_ch = out_ch

            if h.shape[1] in self.attn_resolutions:
                h = AttnBlockpp(skip_rescale=self.skip_rescale,
                                init_scale=self.init_scale, dtype=dt,
                                name=f"up_{i_level}_attn")(h)

            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    if self.progressive == "output_skip":
                        pyramid = act(nn.GroupNorm(
                            num_groups=min(in_ch // 4, 32), epsilon=1e-6, dtype=dt,
                            name=f"up_{i_level}_pyramid_norm")(h))
                        pyramid = Conv3x3(num_channels, init_scale=self.init_scale,
                                          dtype=dt,
                                          name=f"up_{i_level}_pyramid_conv")(pyramid)
                    else:  # residual
                        pyramid = act(nn.GroupNorm(
                            num_groups=min(in_ch // 4, 32), epsilon=1e-6, dtype=dt,
                            name=f"up_{i_level}_pyramid_norm")(h))
                        pyramid = Conv3x3(in_ch, dtype=dt,
                                          name=f"up_{i_level}_pyramid_conv")(pyramid)
                else:
                    if self.progressive == "output_skip":
                        pyramid = blocks.ufd.upsample_2d(
                            pyramid, self.fir_kernel, factor=2) if self.fir else \
                            jax.image.resize(
                                pyramid,
                                (pyramid.shape[0], pyramid.shape[1] * 2,
                                 pyramid.shape[2] * 2, pyramid.shape[3]), "nearest")
                        pyramid_h = act(nn.GroupNorm(
                            num_groups=min(in_ch // 4, 32), epsilon=1e-6, dtype=dt,
                            name=f"up_{i_level}_pyramid_norm")(h))
                        pyramid_h = Conv3x3(num_channels, init_scale=self.init_scale,
                                            dtype=dt,
                                            name=f"up_{i_level}_pyramid_conv")(pyramid_h)
                        pyramid = pyramid + pyramid_h
                    else:  # residual
                        pyramid = Upsample(out_ch=in_ch, with_conv=True, fir=self.fir,
                                           fir_kernel=self.fir_kernel, dtype=dt,
                                           name=f"up_{i_level}_pyramid_up")(pyramid)
                        if self.skip_rescale:
                            pyramid = (pyramid + h) / math.sqrt(2.0)
                        else:
                            pyramid = pyramid + h
                        h = pyramid

            if i_level != 0:
                if self.resblock_type == "ddpm":
                    h = Upsample(with_conv=self.resamp_with_conv, fir=self.fir,
                                 fir_kernel=self.fir_kernel, dtype=dt,
                                 name=f"up_{i_level}_upsample")(h)
                else:
                    h = self._resblock(act, in_ch, up=True,
                                       name=f"up_{i_level}_upres")(h, temb, train)

        assert not hs

        if self.progressive == "output_skip":
            h = pyramid
        else:
            h = act(nn.GroupNorm(num_groups=min(in_ch // 4, 32), epsilon=1e-6,
                                 dtype=dt, name="out_norm")(h))
            h = Conv3x3(num_channels, init_scale=self.init_scale, dtype=dt,
                        name="out_conv")(h)

        # --- output scaling + complex packing -----------------------------------------
        def apply_output_layer(hh):
            # 1x1 conv 4 -> 2 with torch-default init (reference ncsnpp.py:105).
            return nn.Conv(2, (1, 1), padding="VALID", dtype=dt,
                           kernel_init=torch_conv_default_init(),
                           bias_init=blocks.torch_conv_bias_init(hh.shape[-1]),
                           name="output_layer")(hh)

        h = h.astype(jnp.float32)
        if self.output_layer_before_sigma:
            # ncsnpp_48k order (ncsnpp_48k.py:414-424).
            h = apply_output_layer(h)
            if self.scale_by_sigma:
                h = h / used_sigmas[:, None, None, None]
        else:
            if self.scale_by_sigma:
                h = h / used_sigmas[:, None, None, None]
            h = apply_output_layer(h)

        return (h[..., 0] + 1j * h[..., 1])[:, None, :, :].astype(jnp.complex64)


@BackboneRegistry.register("ncsnpp")
class NCSNpp(NCSNppBase):
    """SGMSE+ flagship backbone (reference ncsnpp.py:36-419)."""

    @staticmethod
    def add_argparse_args(parser):
        parser.add_argument("--nf", type=int, default=128,
                            help="Base channel count (the reference hardcodes "
                                 "128; exposed here for small-scale runs).")
        parser.add_argument("--ch_mult", type=int, nargs="+", default=[1, 1, 2, 2, 2, 2, 2])
        parser.add_argument("--num_res_blocks", type=int, default=2)
        parser.add_argument("--attn_resolutions", type=int, nargs="+", default=[16])
        parser.add_argument("--no-centered", dest="centered", action="store_false",
                            help="The data is not centered [-1, 1]")
        parser.add_argument("--centered", dest="centered", action="store_true",
                            help="The data is centered [-1, 1]")
        parser.set_defaults(centered=True)
        parser.add_argument("--precision", type=str, default="float32",
                            choices=("float32", "bfloat16"),
                            help="Compute dtype (params stay float32).")
        parser.add_argument("--remat", action="store_true",
                            help="Recompute res-block activations in backward "
                                 "(less memory, ~30%% more FLOPs).")
        return parser


@BackboneRegistry.register("ncsnpp_v2")
class NCSNpp_v2(NCSNppBase):
    """ADM-style variant used with preconditioning (reference ncsnpp_v2.py:36-395).

    No sigma-scaling and no centering shift; always conditional. The
    c_in/c_out/c_skip preconditioning and any output negation live in the
    ScoreModel (reference model.py:283-304).
    """
    scale_by_sigma: bool = False
    centered: bool = True

    @staticmethod
    def add_argparse_args(parser):
        parser.add_argument("--nf", type=int, default=128)
        parser.add_argument("--ch_mult", type=int, nargs="+", default=[1, 1, 2, 2, 2, 2, 2])
        parser.add_argument("--num_res_blocks", type=int, default=2)
        parser.add_argument("--attn_resolutions", type=int, nargs="+", default=[16])
        parser.add_argument("--precision", type=str, default="float32",
                            choices=("float32", "bfloat16"),
                            help="Compute dtype (params stay float32).")
        parser.add_argument("--remat", action="store_true",
                            help="Recompute res-block activations in backward "
                                 "(less memory, ~30%% more FLOPs).")
        return parser


@BackboneRegistry.register("ncsnpp_48k")
class NCSNpp_48k(NCSNppBase):
    """48 kHz fullband variant: attention-free, no progressive pyramids, output
    conv before sigma-scaling (reference ncsnpp_48k.py:36-424)."""
    attn_resolutions: Tuple[int, ...] = ()
    progressive: str = "none"
    progressive_input: str = "none"
    output_layer_before_sigma: bool = True

    @staticmethod
    def add_argparse_args(parser):
        parser.add_argument("--ch_mult", type=int, nargs="+", default=[1, 1, 2, 2, 2, 2, 2])
        parser.add_argument("--num_res_blocks", type=int, default=2)
        parser.add_argument("--attn_resolutions", type=int, nargs="+", default=[])
        parser.add_argument("--nf", type=int, default=128,
                            help="Number of channels to use in the model")
        parser.add_argument("--no-centered", dest="centered", action="store_false")
        parser.add_argument("--centered", dest="centered", action="store_true")
        parser.set_defaults(centered=True)
        parser.add_argument("--progressive", type=str, default="none",
                            help="Progressive downsampling method")
        parser.add_argument("--progressive_input", type=str, default="none",
                            help="Progressive upsampling method")
        parser.add_argument("--precision", type=str, default="float32",
                            choices=("float32", "bfloat16"),
                            help="Compute dtype (params stay float32).")
        parser.add_argument("--remat", action="store_true",
                            help="Recompute res-block activations in backward "
                                 "(less memory, ~30%% more FLOPs).")
        return parser
