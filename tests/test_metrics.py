"""Metric sanity tests: SI-SDR family, STOI/ESTOI behavior, stats helpers."""
import numpy as np
import pytest

from sgmse_tpu.utils import metrics as M

SR = 16000


@pytest.fixture(scope="module")
def speechlike():
    """Amplitude-modulated multi-tone — enough temporal structure for STOI."""
    rng = np.random.default_rng(0)
    t = np.arange(3 * SR) / SR
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)
    x = env * (np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 800 * t)
               + 0.3 * np.sin(2 * np.pi * 2000 * t))
    noise = rng.standard_normal(len(t))
    return x.astype(np.float64), noise.astype(np.float64)


def test_si_sdr_scale_invariance(speechlike):
    x, n = speechlike
    noisy = x + 0.1 * n
    assert abs(M.si_sdr(x, noisy) - M.si_sdr(x, 2.0 * noisy)) < 1e-6


def test_si_sdr_improves_with_less_noise(speechlike):
    x, n = speechlike
    assert M.si_sdr(x, x + 0.01 * n) > M.si_sdr(x, x + 0.3 * n)


def test_energy_ratios_decomposition(speechlike):
    x, n = speechlike
    s_hat = x + 0.1 * n
    si_sdr_, si_sir, si_sar = M.energy_ratios(s_hat, x, n)
    assert si_sir < si_sar  # error is mostly noise, not artifacts
    assert np.isfinite(si_sdr_)
    # si_sdr from energy_ratios should be close to plain si_sdr here
    assert abs(si_sdr_ - M.si_sdr(x, s_hat)) < 1.0


@pytest.mark.parametrize("extended", [False, True])
def test_stoi_perfect_and_degraded(speechlike, extended):
    x, n = speechlike
    perfect = M.stoi(x, x, SR, extended=extended)
    assert perfect > 0.98
    light = M.stoi(x, x + 0.05 * np.std(x) / np.std(n) * n * 10, SR, extended=extended)
    heavy = M.stoi(x, x + 2.0 * np.std(x) / np.std(n) * n, SR, extended=extended)
    assert heavy < light <= 1.001
    assert heavy < perfect


def test_stoi_monotone_in_snr(speechlike):
    x, n = speechlike
    scores = []
    for snr_db in (20, 5, -5):
        sigma = np.std(x) / (10 ** (snr_db / 20)) / np.std(n)
        scores.append(M.stoi(x, x + sigma * n, SR, extended=True))
    assert scores[0] > scores[1] > scores[2]


def test_pesq_always_available(speechlike):
    # With the built-in P.862 fallback (utils/p862.py), pesq_wb returns a
    # real score even without the external `pesq` package.
    x, _ = speechlike
    val = M.pesq_wb(16000, x, x)
    assert np.isfinite(val) and val > 4.4


def test_mean_std_nan_robust():
    m, s = M.mean_std(np.asarray([1.0, np.nan, 3.0]))
    assert m == 2.0


def test_print_mean_std():
    assert "±" in M.print_mean_std([1.0, 2.0, 3.0])


def test_snr_db():
    x = np.ones(100)
    n = np.ones(100) * 0.1
    assert abs(M.snr_dB(x, n) - 20.0) < 1e-6


def test_rtf_harness_and_debug_nans():
    import jax
    import jax.numpy as jnp
    from sgmse_tpu.utils.profiling import debug_nans, rtf_harness

    f = jax.jit(lambda: jnp.ones((32, 32)).sum())
    out = rtf_harness(lambda: f(), audio_seconds=2.0, warmup=1, reps=2)
    assert out["rtf"] > 0 and abs(out["inv_rtf"] * out["rtf"] - 1.0) < 1e-6
    with debug_nans(True):
        assert jax.config.jax_debug_nans
    assert not jax.config.jax_debug_nans


def test_method_accumulator_and_print_metrics(capsys):
    m = M.Method("ours", "/tmp", ["pesq", "si_sdr"])
    for v in (1.0, 2.0, 3.0):
        m.append("pesq", v)
    mean, ci = m.get_mean_ci("pesq")
    assert mean == 2.0 and ci > 0

    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32) * 0.1
    y = x + rng.standard_normal(16000).astype(np.float32) * 0.05
    M.print_metrics(x, y, [x], ["identity"], sr=16000)
    out = capsys.readouterr().out
    assert "Mixture:" in out and "identity" in out
