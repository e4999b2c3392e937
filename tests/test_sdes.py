"""SDE closed-form tests: marginals vs Monte-Carlo / reference formulas."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgmse_tpu.sdes import OUVESDE, SBVESDE, SDERegistry, crandn


def test_registry():
    assert "ouve" in SDERegistry
    assert "sbve" in SDERegistry
    assert SDERegistry.get_by_name("ouve") is OUVESDE


def test_ouve_closed_forms():
    """Check mean/std against the reference formulas (sdes.py:198-219)."""
    sde = OUVESDE()
    t = jnp.asarray([0.1, 0.5, 1.0])
    x0 = jnp.ones((3, 1, 4, 4), dtype=jnp.complex64) * 2.0
    y = jnp.ones((3, 1, 4, 4), dtype=jnp.complex64) * -1.0
    mean, std = sde.marginal_prob(x0, y, t)
    theta, smin, smax = 1.5, 0.05, 0.5
    logsig = np.log(smax / smin)
    tn = np.asarray(t)
    exp_i = np.exp(-theta * tn)
    ref_mean = exp_i * 2.0 + (1 - exp_i) * (-1.0)
    np.testing.assert_allclose(np.asarray(mean)[:, 0, 0, 0].real, ref_mean, rtol=1e-5)
    ref_std = np.sqrt(
        smin**2 * np.exp(-2 * theta * tn) * (np.exp(2 * (theta + logsig) * tn) - 1) * logsig
        / (theta + logsig)
    )
    np.testing.assert_allclose(np.asarray(std), ref_std, rtol=1e-5)


def test_ouve_std_vs_monte_carlo():
    """The closed-form perturbation std must match simulating the forward SDE."""
    sde = OUVESDE()
    key = jax.random.key(0)
    n_paths, n_steps = 4096, 400
    t_end = 0.8
    dt = t_end / n_steps
    x = jnp.zeros((n_paths,))
    y = jnp.zeros((n_paths,))

    def step(carry, i):
        x, key = carry
        t = i * dt
        drift = sde.theta * (y - x)
        sigma = sde.sigma_min * (sde.sigma_max / sde.sigma_min) ** t
        g = sigma * np.sqrt(2 * sde.logsig)
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, x.shape)
        x = x + drift * dt + g * np.sqrt(dt) * z
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, key), jnp.arange(n_steps))
    mc_std = float(jnp.std(x))
    ref_std = float(sde._std(jnp.asarray([t_end]))[0])
    assert abs(mc_std - ref_std) / ref_std < 0.05


def test_ouve_prior_sampling_stats():
    sde = OUVESDE()
    key = jax.random.key(42)
    y = jnp.zeros((1, 1, 64, 64), dtype=jnp.complex64)
    xT = sde.prior_sampling(key, y)
    # E|x_T|^2 should be sigma(T)^2 (complex circular normal, var split re/im)
    emp = float(jnp.mean(jnp.abs(xT) ** 2))
    ref = float(sde._std(jnp.asarray([1.0]))[0]) ** 2
    assert abs(emp - ref) / ref < 0.1


def test_sbve_tables():
    sde = SBVESDE()
    t = jnp.asarray([0.2, 0.7])
    sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart = sde.sigmas_alphas(t)
    k, c = 2.6, 0.4
    tn = np.asarray(t)
    ref_sigma_t = np.sqrt(c * (k ** (2 * tn) - 1) / (2 * np.log(k)))
    np.testing.assert_allclose(np.asarray(sigma_t), ref_sigma_t, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha_t), 1.0)
    ref_sigma_T = np.sqrt(c * (k**2 - 1) / (2 * np.log(k)))
    np.testing.assert_allclose(np.asarray(sigma_T), ref_sigma_T, rtol=1e-5)


def test_sbve_marginal_endpoints():
    """At t=0 the marginal mean is ~x0; at t=T it is ~y (bridge endpoints)."""
    sde = SBVESDE()
    x0 = jnp.ones((2, 1, 4, 4), dtype=jnp.complex64) * 3.0
    y = jnp.ones((2, 1, 4, 4), dtype=jnp.complex64) * -2.0
    m0, s0 = sde.marginal_prob(x0, y, jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(m0).real, 3.0, atol=1e-3)
    mT, sT = sde.marginal_prob(x0, y, jnp.ones((2,)))
    np.testing.assert_allclose(np.asarray(mT).real, -2.0, atol=1e-3)
    assert float(s0[0]) < 1e-3
    assert float(sT[0]) < 1e-3


def test_sbve_prior_is_y():
    sde = SBVESDE()
    y = jnp.ones((1, 1, 4, 4), dtype=jnp.complex64)
    xT = sde.prior_sampling(jax.random.key(0), y)
    np.testing.assert_array_equal(np.asarray(xT), np.asarray(y))


def test_reverse_discretize_consistency():
    """reverse_discretize must equal f - G^2*score, G (reference sdes.py:130-135)."""
    sde = OUVESDE()
    key = jax.random.key(1)
    x = crandn(key, (2, 1, 8, 8))
    y = crandn(jax.random.key(2), (2, 1, 8, 8))
    t = jnp.asarray([0.4, 0.9])
    score = crandn(jax.random.key(3), (2, 1, 8, 8))
    stepsize = jnp.float32(1.0 / 30)
    f, G = sde.discretize(x, y, t, stepsize)
    rev_f, rev_G = sde.reverse_discretize(score, x, y, t, stepsize)
    np.testing.assert_allclose(
        np.asarray(rev_f), np.asarray(f - G[:, None, None, None] ** 2 * score), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rev_G), np.asarray(G), atol=1e-6)


def test_crandn_variance():
    z = crandn(jax.random.key(0), (100000,))
    assert abs(float(jnp.mean(jnp.abs(z) ** 2)) - 1.0) < 0.02
    assert abs(float(jnp.var(z.real)) - 0.5) < 0.02
