"""upfirdn2d parity tests against an independent numpy oracle of the spec.

The oracle implements the documented semantics (upsample -> pad -> convolve with
flipped kernel -> downsample; op/upfirdn2d_native.py is the executable spec):
    out_size = (in*up + pad0 + pad1 - k) // down + 1
"""
import numpy as np
import pytest

import jax.numpy as jnp

from sgmse_tpu.ops import upfirdn2d as ufd


def oracle_upfirdn2d(x_nhwc, kernel, up=1, down=1, pad=(0, 0)):
    """Straightforward per-pixel numpy implementation of the upfirdn2d spec."""
    b, h, w, c = x_nhwc.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    # 1. zero-stuff upsample (each sample followed by up-1 zeros)
    uh, uw = h * up, w * up
    z = np.zeros((b, uh, uw, c), dtype=np.float64)
    z[:, ::up, ::up, :] = x_nhwc
    # 2. pad (negative = crop)
    out_h_full = uh + pad0 + pad1
    out_w_full = uw + pad0 + pad1
    padded = np.zeros((b, out_h_full, out_w_full, c), dtype=np.float64)
    src_y0, src_y1 = max(-pad0, 0), uh - max(-pad1, 0)
    src_x0, src_x1 = max(-pad0, 0), uw - max(-pad1, 0)
    dst_y0 = max(pad0, 0)
    dst_x0 = max(pad0, 0)
    padded[:, dst_y0:dst_y0 + (src_y1 - src_y0), dst_x0:dst_x0 + (src_x1 - src_x0), :] = \
        z[:, src_y0:src_y1, src_x0:src_x1, :]
    # 3. convolve with flipped kernel (i.e. true convolution)
    kf = kernel[::-1, ::-1]
    oh = out_h_full - kh + 1
    ow = out_w_full - kw + 1
    out = np.zeros((b, oh, ow, c), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * padded[:, i:i + oh, j:j + ow, :]
    # 4. downsample
    return out[:, ::down, ::down, :]


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1)


FIR = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32) / 64.0


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (0, 0)),
    (2, 1, (2, 1)),   # FIR upsample shape
    (1, 2, (1, 1)),   # FIR downsample shape
    (2, 1, (3, 1)),
    (1, 2, (2, 1)),
    (1, 1, (-1, 2)),  # negative padding (fused conv paths)
    (2, 2, (1, -1)),
])
def test_upfirdn_matches_oracle(rng, up, down, pad):
    x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    ref = oracle_upfirdn2d(x, FIR, up=up, down=down, pad=pad)
    got = np.asarray(ufd.upfirdn2d(jnp.asarray(x), FIR, up=up, down=down, pad=pad))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_upfirdn_nonseparable_kernel(rng):
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    k = rng.standard_normal((3, 3)).astype(np.float32)  # generic, non-separable
    ref = oracle_upfirdn2d(x, k, up=2, down=1, pad=(1, 1))
    got = np.asarray(ufd.upfirdn2d(jnp.asarray(x), k, up=2, down=1, pad=(1, 1)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_upsample_2d(rng):
    """upsample_2d == upfirdn(k*factor^2, up=2, pad=((p+1)//2+1, p//2))."""
    x = rng.standard_normal((2, 16, 12, 4)).astype(np.float32)
    k = ufd.setup_kernel([1, 3, 3, 1]) * 4.0
    p = k.shape[0] - 2
    ref = oracle_upfirdn2d(x, k, up=2, down=1, pad=((p + 1) // 2 + 1, p // 2))
    got = np.asarray(ufd.upsample_2d(jnp.asarray(x), [1, 3, 3, 1], factor=2))
    assert got.shape == (2, 32, 24, 4)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_downsample_2d(rng):
    x = rng.standard_normal((2, 16, 12, 4)).astype(np.float32)
    k = ufd.setup_kernel([1, 3, 3, 1])
    p = k.shape[0] - 2
    ref = oracle_upfirdn2d(x, k, up=1, down=2, pad=((p + 1) // 2, p // 2))
    got = np.asarray(ufd.downsample_2d(jnp.asarray(x), [1, 3, 3, 1], factor=2))
    assert got.shape == (2, 8, 6, 4)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_upsample_conv_2d(rng):
    """Fused path == upsample by zero-stuffing -> full conv(w) -> FIR filter."""
    x = rng.standard_normal((1, 8, 10, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 5)).astype(np.float32)  # HWIO
    factor = 2
    # Oracle: zero-stuff (no trailing zeros: (in-1)*f + 1), pad k-1, correlate with w.
    b, h, wd, cin = x.shape
    kh = w.shape[0]
    z = np.zeros((b, (h - 1) * factor + 1, (wd - 1) * factor + 1, cin))
    z[:, ::factor, ::factor, :] = x
    zp = np.pad(z, ((0, 0), (kh - 1, kh - 1), (kh - 1, kh - 1), (0, 0)))
    oh, ow = zp.shape[1] - kh + 1, zp.shape[2] - kh + 1
    y = np.zeros((b, oh, ow, w.shape[3]))
    for i in range(kh):
        for j in range(kh):
            y += np.einsum("bhwc,co->bhwo", zp[:, i:i + oh, j:j + ow, :], w[i, j])
    k = ufd.setup_kernel([1, 3, 3, 1]) * (factor**2)
    p = (k.shape[0] - factor) - (kh - 1)
    ref = oracle_upfirdn2d(y, k, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))
    got = np.asarray(ufd.upsample_conv_2d(jnp.asarray(x), jnp.asarray(w), [1, 3, 3, 1]))
    assert got.shape == (1, 16, 20, 5)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conv_downsample_2d(rng):
    x = rng.standard_normal((1, 8, 10, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 5)).astype(np.float32)
    factor = 2
    k = ufd.setup_kernel([1, 3, 3, 1])
    p = (k.shape[0] - factor) + (w.shape[0] - 1)
    xf = oracle_upfirdn2d(x, k, pad=((p + 1) // 2, p // 2))
    # correlate with w, stride 2, VALID
    kh = w.shape[0]
    oh = (xf.shape[1] - kh) // factor + 1
    ow = (xf.shape[2] - kh) // factor + 1
    ref = np.zeros((1, oh, ow, 5))
    for i in range(kh):
        for j in range(kh):
            ref += np.einsum("bhwc,co->bhwo",
                             xf[:, i:i + oh * factor:factor, j:j + ow * factor:factor, :], w[i, j])
    got = np.asarray(ufd.conv_downsample_2d(jnp.asarray(x), jnp.asarray(w), [1, 3, 3, 1]))
    assert got.shape == (1, 4, 5, 5)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_naive_resampling(rng):
    x = rng.standard_normal((2, 4, 6, 3)).astype(np.float32)
    up = np.asarray(ufd.naive_upsample_2d(jnp.asarray(x)))
    assert up.shape == (2, 8, 12, 3)
    np.testing.assert_allclose(up[:, ::2, ::2], x)
    np.testing.assert_allclose(up[:, 1::2, 1::2], x)
    down = np.asarray(ufd.naive_downsample_2d(jnp.asarray(up)))
    np.testing.assert_allclose(down, x, atol=1e-6)
