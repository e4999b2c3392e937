"""Pallas FIR resampling kernels vs the XLA reference semantics (interpret mode
on CPU), including the custom VJPs."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import sgmse_tpu.ops.pallas_fir as pf
import sgmse_tpu.ops.upfirdn2d as ufd

K = [1.0, 3.0, 3.0, 1.0]


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    # route through the pallas path irrespective of backend
    monkeypatch.setattr(ufd, "USE_PALLAS", True)
    yield


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _xla_up(x):
    k2d = ufd.setup_kernel(K) * 4.0
    p = k2d.shape[0] - 2
    return ufd.upfirdn2d(x, k2d, up=2, pad=((p + 1) // 2 + 1, p // 2))


def _xla_down(x):
    k2d = ufd.setup_kernel(K)
    p = k2d.shape[0] - 2
    return ufd.upfirdn2d(x, k2d, down=2, pad=((p + 1) // 2, p // 2))


@pytest.mark.parametrize("shape", [(2, 16, 24, 8), (1, 8, 8, 3), (1, 64, 96, 16)])
def test_pallas_upsample_matches_xla(rng, shape):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = pf.fir_upsample_2d(x, K)
    ref = _xla_up(x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 16, 24, 8), (1, 8, 8, 3), (1, 64, 96, 16)])
def test_pallas_downsample_matches_xla(rng, shape):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = pf.fir_downsample_2d(x, K)
    ref = _xla_down(x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_upsample_vjp_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 4)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, 16, 24, 4)).astype(np.float32))
    _, vjp_pallas = jax.vjp(lambda xx: pf.fir_upsample_2d_ad(xx, tuple(K)), x)
    _, vjp_xla = jax.vjp(_xla_up, x)
    np.testing.assert_allclose(np.asarray(vjp_pallas(g)[0]),
                               np.asarray(vjp_xla(g)[0]), atol=1e-5)


def test_downsample_vjp_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 4)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, 4, 6, 4)).astype(np.float32))
    _, vjp_pallas = jax.vjp(lambda xx: pf.fir_downsample_2d_ad(xx, tuple(K)), x)
    _, vjp_xla = jax.vjp(_xla_down, x)
    np.testing.assert_allclose(np.asarray(vjp_pallas(g)[0]),
                               np.asarray(vjp_xla(g)[0]), atol=1e-5)


def test_dispatch_through_public_api(rng):
    """upsample_2d/downsample_2d route through pallas when USE_PALLAS=True."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    up = ufd.upsample_2d(x, K, factor=2)
    ref = _xla_up(x)
    np.testing.assert_allclose(np.asarray(up), np.asarray(ref), atol=1e-5)
    down = ufd.downsample_2d(x, K, factor=2)
    np.testing.assert_allclose(np.asarray(down), np.asarray(_xla_down(x)), atol=1e-5)
