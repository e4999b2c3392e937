"""Differentiable PESQ loss: monotonicity, identity, gradients, jit."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgmse_tpu.utils.pesq_loss import PesqLoss


@pytest.fixture(scope="module")
def signals():
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    # Speech-ish signal: AM-modulated harmonic stack with pauses.
    env = (np.sin(2 * np.pi * 3.0 * t) > 0).astype(np.float32)
    clean = env * sum(np.sin(2 * np.pi * f0 * t) / k
                      for k, f0 in enumerate([220.0, 440.0, 880.0], start=1))
    clean = (0.3 * clean / np.max(np.abs(clean))).astype(np.float32)
    noise = rng.standard_normal(16000).astype(np.float32)
    return clean, noise


def test_identical_signals_low_loss(signals):
    clean, _ = signals
    loss_fn = PesqLoss(1.0, sample_rate=16000)
    loss = float(loss_fn(jnp.asarray(clean), jnp.asarray(clean)))
    mos = float(loss_fn.mos(jnp.asarray(clean), jnp.asarray(clean)))
    assert loss < 0.05
    assert mos > 4.3


def test_loss_monotone_in_noise(signals):
    clean, noise = signals
    loss_fn = PesqLoss(1.0, sample_rate=16000)
    losses = []
    for snr_db in (40.0, 20.0, 5.0):
        sigma = np.sqrt(np.mean(clean ** 2) / 10 ** (snr_db / 10))
        deg = clean + sigma * noise
        losses.append(float(loss_fn(jnp.asarray(clean), jnp.asarray(deg))))
    assert losses[0] < losses[1] < losses[2], losses


def test_mos_monotone_and_bounded(signals):
    clean, noise = signals
    loss_fn = PesqLoss(1.0, sample_rate=16000)
    mos_clean = float(loss_fn.mos(jnp.asarray(clean), jnp.asarray(clean)))
    deg = clean + 0.3 * noise
    mos_noisy = float(loss_fn.mos(jnp.asarray(clean), jnp.asarray(deg)))
    assert 1.0 <= mos_noisy < mos_clean <= 4.64


def test_gradient_flows(signals):
    clean, noise = signals
    loss_fn = PesqLoss(1.0, sample_rate=16000)
    deg = jnp.asarray(clean + 0.1 * noise)

    g = jax.grad(lambda d: jnp.sum(loss_fn(jnp.asarray(clean), d)))(deg)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0.0


def test_batched_and_jitted(signals):
    clean, noise = signals
    loss_fn = PesqLoss(2.0, sample_rate=16000)
    ref = jnp.stack([jnp.asarray(clean)] * 2)
    deg = jnp.stack([jnp.asarray(clean), jnp.asarray(clean + 0.2 * noise)])
    vals = jax.jit(loss_fn.__call__)(ref, deg)
    assert vals.shape == (2,)
    assert float(vals[0]) < float(vals[1])


def test_rejects_other_sample_rates():
    with pytest.raises(ValueError):
        PesqLoss(1.0, sample_rate=48000)


def test_gradient_finite_at_identical_and_silent_inputs():
    """NaN-gradient regression (round 3): with deg == ref the masked
    disturbance density is EXACTLY zero, and the un-guarded sqrt/pow
    aggregations had infinite slope at 0 — the loss value was finite but its
    gradient was NaN, which NaN'd the whole SB data_prediction training run
    (--pesq_weight 5e-4) after one optimizer step."""
    loss = PesqLoss(1.0)
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.standard_normal(16000).astype(np.float32) * 0.3)

    g = jax.grad(lambda d: loss(ref, d).sum())(ref)  # deg == ref
    assert np.all(np.isfinite(np.asarray(g)))

    g0 = jax.grad(lambda d: loss(ref, d).sum())(jnp.zeros_like(ref))  # silence
    assert np.all(np.isfinite(np.asarray(g0)))

    # Both-silent: fully degenerate input must still be finite.
    gs = jax.grad(lambda d: loss(jnp.zeros_like(ref), d).sum())(jnp.zeros_like(ref))
    assert np.all(np.isfinite(np.asarray(gs)))
