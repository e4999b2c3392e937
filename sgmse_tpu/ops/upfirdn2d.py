"""Fused upsample -> FIR filter -> downsample (upfirdn2d) and the StyleGAN2-style
resampling ops built on it, in NHWC layout for TPU.

Semantics match the reference's executable spec
(/root/reference/sgmse/backbones/ncsnpp_utils/op/upfirdn2d_native.py:15-56):

    1. zero-stuff upsample by ``up`` (each sample followed by up-1 zeros),
    2. pad by (pad0, pad1) per spatial axis (negative => crop),
    3. correlate with the *flipped* 2-D FIR kernel,
    4. subsample with stride ``down``.

    out_size = (in*up + pad0 + pad1 - k) // down + 1

Instead of a CUDA kernel (reference op/upfirdn2d_kernel.cu), the op maps onto a
single ``lax.conv_general_dilated`` call: ``lhs_dilation`` expresses the
zero-stuffing exactly, ``window_strides`` the downsampling, and negative conv
padding the cropping — XLA lowers this to one fused depthwise conv on the MXU/VPU.
Separable FIR kernels (all kernels NCSN++ uses are outer products of [1,3,3,1])
are split into two rank-1 passes, halving the arithmetic.

The resampling wrappers mirror
/root/reference/sgmse/backbones/ncsnpp_utils/up_or_down_sampling.py:59-257.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Kernel = Union[Sequence[float], np.ndarray]


def setup_kernel(k: Kernel) -> np.ndarray:
    """Normalize a FIR kernel: 1-D kernels become outer products; sum normalized to 1.

    Reference: up_or_down_sampling.py:181-188.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def _is_separable(k: np.ndarray) -> Optional[np.ndarray]:
    """If k is (numerically) an outer product v v^T, return v; else None."""
    u, s, vt = np.linalg.svd(k)
    if s.shape[0] > 1 and s[1] > 1e-6 * s[0]:
        return None
    v_col = u[:, 0] * np.sqrt(s[0])
    v_row = vt[0, :] * np.sqrt(s[0])
    if not np.allclose(np.outer(v_col, v_row), k, atol=1e-7):
        return None
    if not np.allclose(v_col, v_row, atol=1e-7):
        return None
    return v_col.astype(np.float32)


def _depthwise_conv(
    x: jnp.ndarray,
    kernel2d: jnp.ndarray,
    strides: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    lhs_dilation: Tuple[int, int],
) -> jnp.ndarray:
    """Depthwise NHWC conv with the given (already flipped) kernel."""
    c = x.shape[-1]
    rhs = jnp.broadcast_to(kernel2d[:, :, None, None], kernel2d.shape + (1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def upfirdn2d(
    x: jnp.ndarray,
    kernel: Kernel,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """upfirdn2d on NHWC input, same up/down/pad for both spatial axes.

    Matches ``upfirdn2d(input, kernel, up, down, pad)`` in the reference
    (op/upfirdn2d.py:148-159) modulo the NCHW->NHWC layout change.
    """
    k = np.asarray(kernel, dtype=np.float32)
    assert k.ndim == 2
    pad0, pad1 = pad

    sep = _is_separable(k)
    if sep is not None:
        return _upfirdn_separable(x, sep, up, down, pad0, pad1)

    # Correlate with flipped kernel == true convolution with the kernel.
    kflip = jnp.asarray(k[::-1, ::-1].copy())
    # lhs_dilation gives (in-1)*up + 1 samples; native zero-stuffing gives in*up,
    # i.e. up-1 trailing zeros more — folded into the high conv padding.
    extra = up - 1
    return _depthwise_conv(
        x,
        kflip,
        strides=(down, down),
        padding=((pad0, pad1 + extra), (pad0, pad1 + extra)),
        lhs_dilation=(up, up),
    )


def _upfirdn_separable(x, k1d: np.ndarray, up: int, down: int, pad0: int, pad1: int):
    """Two rank-1 passes (H then W) for separable kernels."""
    kflip = jnp.asarray(k1d[::-1].copy())
    extra = up - 1
    c = x.shape[-1]
    # H axis
    rhs_h = jnp.broadcast_to(kflip[:, None, None, None], (k1d.shape[0], 1, 1, c)).astype(x.dtype)
    x = jax.lax.conv_general_dilated(
        x, rhs_h, window_strides=(down, 1),
        padding=((pad0, pad1 + extra), (0, 0)),
        lhs_dilation=(up, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    # W axis
    rhs_w = jnp.broadcast_to(kflip[None, :, None, None], (1, k1d.shape[0], 1, c)).astype(x.dtype)
    x = jax.lax.conv_general_dilated(
        x, rhs_w, window_strides=(1, down),
        padding=((0, 0), (pad0, pad1 + extra)),
        lhs_dilation=(1, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return x


# ---------------------------------------------------------------------------------------
# StyleGAN2-style resampling ops (reference up_or_down_sampling.py)
# ---------------------------------------------------------------------------------------

# A hand-written fused Pallas FIR kernel was built, tested (interpret mode),
# and DELETED in round 2 after profiling the flagship inference program on
# chip: XLA fuses the GroupNorm statistics and all elementwise work into the
# convolutions, which run at ~88% of v5e bf16 peak in aggregate (82% MFU end
# to end, see docs/PERFORMANCE.md). There is no kernel-level headroom for a
# custom FIR op at these shapes, and the kernels did not lower under Mosaic
# on real TPU (stride-2 sublane slices / gather limits). The XLA
# `lhs_dilation` formulation below IS the performance path.

def upsample_2d(x: jnp.ndarray, k: Kernel = None, factor: int = 2, gain: float = 1.0):
    """FIR upsample by `factor` (reference up_or_down_sampling.py:195-224). NHWC."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * (gain * (factor**2))
    p = k.shape[0] - factor
    return upfirdn2d(x, k, up=factor, pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: jnp.ndarray, k: Kernel = None, factor: int = 2, gain: float = 1.0):
    """FIR downsample by `factor` (reference up_or_down_sampling.py:227-257). NHWC."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * gain
    p = k.shape[0] - factor
    return upfirdn2d(x, k, down=factor, pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(x: jnp.ndarray, w: jnp.ndarray, k: Kernel = None,
                     factor: int = 2, gain: float = 1.0):
    """Fused zero-stuff-upsample -> conv(w) -> FIR filter.

    Reference: up_or_down_sampling.py:72-141 (conv_transpose2d + upfirdn2d).
    Here the transposed conv is expressed directly as a conv with ``lhs_dilation``
    (no weight flipping gymnastics needed: the reference's double flip cancels,
    so the net op is a plain correlation with ``w`` on the zero-stuffed input).

    Args:
        x: (B, H, W, C_in). w: HWIO weights (convH, convW, C_in, C_out).
    """
    assert isinstance(factor, int) and factor >= 1
    convH, convW, _inC, _outC = w.shape
    assert convH == convW
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * (gain * (factor**2))
    p = (k.shape[0] - factor) - (convW - 1)

    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((convH - 1, convH - 1), (convW - 1, convW - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return upfirdn2d(y, k, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x: jnp.ndarray, w: jnp.ndarray, k: Kernel = None,
                       factor: int = 2, gain: float = 1.0):
    """Fused FIR filter -> conv(w) with stride `factor`.

    Reference: up_or_down_sampling.py:144-178. NHWC; w is HWIO.
    """
    assert isinstance(factor, int) and factor >= 1
    convH, convW, _inC, _outC = w.shape
    assert convH == convW
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * gain
    p = (k.shape[0] - factor) + (convW - 1)
    x = upfirdn2d(x, k, pad=((p + 1) // 2, p // 2))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def naive_upsample_2d(x: jnp.ndarray, factor: int = 2):
    """Nearest-neighbour upsample (reference up_or_down_sampling.py:59-63). NHWC."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def naive_downsample_2d(x: jnp.ndarray, factor: int = 2):
    """Mean-pool downsample (reference up_or_down_sampling.py:66-69). NHWC."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return jnp.mean(x, axis=(2, 4))
