"""Pallas TPU kernels for the FIR 2x resampling ops (the hot upfirdn2d shapes).

The NCSN++ backbones call upfirdn2d in exactly two shapes in the hot path
(every BigGAN res-block transition, reference up_or_down_sampling.py:195-257):
2x FIR upsample and 2x FIR downsample with the separable kernel [1,3,3,1].
The XLA fallback lowers these to depthwise convolutions (VPU, one HBM
round-trip per axis); these kernels instead fuse BOTH axes' polyphase
multiply-adds into one VMEM pass per tile:

  upsample (factor 2, K=4, pad (2,1)):    out has 2 phases per axis
      even[r] = kf0 * x[r-1] + kf2 * x[r]
      odd[r]  = kf1 * x[r]   + kf3 * x[r+1]
  downsample (factor 2, K=4, pad (1,1)):  single phase
      out[r]  = sum_j kf[j] * x[2r - 1 + j]

Tiles are DMA'd from HBM with explicit halo rows/columns (the input is
zero-padded by one element on each side at the XLA level so every tile read is
in-bounds), processed entirely in VMEM, and written through a blocked output
spec. Layout NHWC: C rides the 128-wide lanes, W the sublanes.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target."""
    t = min(n, target)
    while n % t:
        t -= 1
    return t


# ---------------------------------------------------------------------------------------
# 2x upsample
# ---------------------------------------------------------------------------------------

def _upsample_kernel(x_hbm, out_ref, scratch, sem, *, kf, ht, wt, ct):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    c = pl.program_id(3)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * ht, ht + 2), pl.ds(j * wt, wt + 2),
                 pl.ds(c * ct, ct)],
        scratch, sem)
    dma.start()
    dma.wait()
    blk = scratch[:, :, :]  # (ht+2, wt+2, ct), includes 1-halo on each side

    k0, k1, k2, k3 = [float(v) for v in kf]

    # H axis: even[r] uses rows (r, r+1) of the halo'd block, odd[r] rows (r+1, r+2).
    even_h = k0 * blk[0:ht, :, :] + k2 * blk[1:ht + 1, :, :]
    odd_h = k1 * blk[1:ht + 1, :, :] + k3 * blk[2:ht + 2, :, :]
    h_up = jnp.stack([even_h, odd_h], axis=1).reshape(2 * ht, wt + 2, ct)

    # W axis on the H-processed block (halo columns were processed too).
    even_w = k0 * h_up[:, 0:wt, :] + k2 * h_up[:, 1:wt + 1, :]
    odd_w = k1 * h_up[:, 1:wt + 1, :] + k3 * h_up[:, 2:wt + 2, :]
    out = jnp.stack([even_w, odd_w], axis=2).reshape(2 * ht, 2 * wt, ct)
    out_ref[0, :, :, :] = out.astype(out_ref.dtype)


def fir_upsample_2d(x: jnp.ndarray, k1d) -> jnp.ndarray:
    """2x FIR upsample, NHWC, separable length-4 kernel (e.g. [1,3,3,1])."""
    k = np.asarray(k1d, dtype=np.float32)
    assert k.ndim == 1 and k.shape[0] == 4
    k = k / k.sum() * 2.0  # per-axis gain: total factor**2 split over two axes
    kf = k[::-1]

    b, h, w, c = x.shape
    ht = _pick_tile(h, 64)
    wt = _pick_tile(w, 64)
    ct = _pick_tile(c, 128)
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])

    kernel = functools.partial(_upsample_kernel, kf=tuple(kf), ht=ht, wt=wt, ct=ct)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, c), x.dtype),
        grid=(b, h // ht, w // wt, c // ct),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 2 * ht, 2 * wt, ct),
            lambda bi, i, j, ci: (bi, i, j, ci),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ht + 2, wt + 2, ct), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp)


# ---------------------------------------------------------------------------------------
# 2x downsample
# ---------------------------------------------------------------------------------------

def _downsample_kernel(x_hbm, out_ref, scratch, sem, *, kf, ht, wt, ct):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    c = pl.program_id(3)

    # Output tile rows r in [i*ht, (i+1)*ht): needs x[2r-1 .. 2r+2]
    # => padded-input rows [2*i*ht, 2*(i+1)*ht + 2), i.e. 2*ht+2 rows.
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(2 * i * ht, 2 * ht + 2), pl.ds(2 * j * wt, 2 * wt + 2),
                 pl.ds(c * ct, ct)],
        scratch, sem)
    dma.start()
    dma.wait()
    blk = scratch[:, :, :]  # (2ht+2, 2wt+2, ct)

    k0, k1, k2, k3 = [float(v) for v in kf]

    # H axis: out_h[r] = sum_j kf[j] * blk[2r + j], r in [0, ht)
    out_h = (k0 * blk[0:2 * ht:2, :, :]
             + k1 * blk[1:2 * ht:2, :, :]
             + k2 * blk[2:2 * ht + 2:2, :, :]
             + k3 * blk[3:2 * ht + 2:2, :, :])

    out = (k0 * out_h[:, 0:2 * wt:2, :]
           + k1 * out_h[:, 1:2 * wt:2, :]
           + k2 * out_h[:, 2:2 * wt + 2:2, :]
           + k3 * out_h[:, 3:2 * wt + 2:2, :])
    out_ref[0, :, :, :] = out.astype(out_ref.dtype)


# Differentiable wrappers: Pallas forward, exact backward via linear_transpose
# of the XLA fallback (the ops are linear in x, so the transpose IS the VJP).

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fir_upsample_2d_ad(x, k: Tuple[float, ...]):
    return fir_upsample_2d(x, k)


def _xla_upsample(x, k):
    # Inline the XLA form (upfirdn2d with lhs_dilation) rather than calling
    # upsample_2d, which would re-dispatch to the Pallas custom_vjp function
    # when USE_PALLAS is on — jax.linear_transpose cannot transpose that.
    from . import upfirdn2d as ufd
    k2d = ufd.setup_kernel(list(k)) * 4.0
    p = k2d.shape[0] - 2
    return ufd.upfirdn2d(x, k2d, up=2, pad=((p + 1) // 2 + 1, p // 2))


def _up_fwd(x, k):
    return fir_upsample_2d(x, k), jax.ShapeDtypeStruct(x.shape, x.dtype)


def _up_bwd(k, x_spec, g):
    f = lambda xx: _xla_upsample(xx, k)
    (x_bar,) = jax.linear_transpose(f, x_spec)(g)
    return (x_bar,)


fir_upsample_2d_ad.defvjp(_up_fwd, _up_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fir_downsample_2d_ad(x, k: Tuple[float, ...]):
    return fir_downsample_2d(x, k)


def _xla_downsample(x, k):
    # Same as _xla_upsample: inline the XLA form to avoid Pallas re-dispatch.
    from . import upfirdn2d as ufd
    k2d = ufd.setup_kernel(list(k))
    p = k2d.shape[0] - 2
    return ufd.upfirdn2d(x, k2d, down=2, pad=((p + 1) // 2, p // 2))


def _down_fwd(x, k):
    return fir_downsample_2d(x, k), jax.ShapeDtypeStruct(x.shape, x.dtype)


def _down_bwd(k, x_spec, g):
    f = lambda xx: _xla_downsample(xx, k)
    (x_bar,) = jax.linear_transpose(f, x_spec)(g)
    return (x_bar,)


fir_downsample_2d_ad.defvjp(_down_fwd, _down_bwd)


def fir_downsample_2d(x: jnp.ndarray, k1d) -> jnp.ndarray:
    """2x FIR downsample, NHWC, separable length-4 kernel. H and W must be even."""
    k = np.asarray(k1d, dtype=np.float32)
    assert k.ndim == 1 and k.shape[0] == 4
    k = k / k.sum()  # gain 1, split over two axes
    kf = k[::-1]

    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0
    ho, wo = h // 2, w // 2
    ht = _pick_tile(ho, 64)
    wt = _pick_tile(wo, 64)
    ct = _pick_tile(c, 128)
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])

    kernel = functools.partial(_downsample_kernel, kf=tuple(kf), ht=ht, wt=wt, ct=ct)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, c), x.dtype),
        grid=(b, ho // ht, wo // wt, c // ct),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, ht, wt, ct),
            lambda bi, i, j, ci: (bi, i, j, ci),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * ht + 2, 2 * wt + 2, ct), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp)
