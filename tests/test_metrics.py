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


def test_thirdoct_golden():
    """Golden values for the 1/3-octave band matrix at STOI's published
    analysis config (fs=10000, nfft=512, 15 bands from 150 Hz) — the same
    construction pystoi.utils.thirdoct uses (nearest-bin argmin on band
    edges 150*2^((2k±1)/6)). Freezing the exact bin ranges localizes any
    regression to the filterbank stage (VERDICT r4 item 5)."""
    obm, cf = M._thirdoct(10000, 512, 15, 150.0)
    assert obm.shape == (15, 257)
    np.testing.assert_allclose(
        cf, 150.0 * (2.0 ** (1.0 / 3.0)) ** np.arange(15), rtol=1e-12)
    golden_edges = [(7, 9), (9, 11), (11, 14), (14, 17), (17, 22), (22, 27),
                    (27, 34), (34, 43), (43, 55), (55, 69), (69, 87),
                    (87, 109), (109, 138), (138, 174), (174, 219)]
    for i, (lo, hi) in enumerate(golden_edges):
        nz = np.nonzero(obm[i])[0]
        assert (nz[0], nz[-1] + 1) == (lo, hi), f"band {i}"
        assert obm[i].sum() == hi - lo  # contiguous indicator row


def test_estoi_envelope_correlation_stage_golden():
    """The ESTOI intermediate (row- then column-normalized segment
    correlation, Jensen & Taal 2016 eq. 4-6) vs an independent loop-level
    computation on a small random segment batch — localizes a regression to
    the normalization/correlation stage."""
    rng = np.random.default_rng(3)
    xs = rng.random((4, 15, 30)) + 0.1  # (segments M, bands J, frames N)
    ys = xs + 0.3 * rng.random((4, 15, 30))

    xn, yn = M._row_col_normalize(xs), M._row_col_normalize(ys)
    ours = float(np.sum(xn * yn / 30) / xn.shape[0])

    def norm_rows_then_cols(seg):
        seg = seg - seg.mean(axis=1, keepdims=True)
        seg = seg / np.linalg.norm(seg, axis=1, keepdims=True)
        seg = seg - seg.mean(axis=0, keepdims=True)
        return seg / np.linalg.norm(seg, axis=0, keepdims=True)

    total = 0.0
    for xseg, yseg in zip(xs, ys):
        xz, yz = norm_rows_then_cols(xseg), norm_rows_then_cols(yseg)
        total += sum(float(np.dot(xz[:, n], yz[:, n])) for n in range(30)) / 30
    np.testing.assert_allclose(ours, total / 4, rtol=1e-10)


def test_stoi_scale_invariance_exact(speechlike):
    """Pure gain must be a perfect score on both variants: classic STOI
    rescales each segment to the clean norm before correlating; ESTOI's
    double normalization removes gain entirely."""
    x, _ = speechlike
    assert M.stoi(x, 0.25 * x, SR, extended=False) > 0.9999
    assert M.stoi(x, 0.25 * x, SR, extended=True) > 0.9999


def test_stoi_estoi_regression_anchor():
    """Frozen end-to-end values on a deterministic synthetic pair: any change
    to VAD, framing, filterbank, or correlation stages moves these. (Not a
    conformance claim — rank fidelity is quantified in
    tools/estoi_rank_agreement.py, recorded in docs/PARITY.md.)"""
    rng = np.random.default_rng(42)
    t = np.arange(2 * SR) / SR
    env = np.clip(np.sin(2 * np.pi * 4 * t), 0, None)
    x = env * (np.sin(2 * np.pi * 300 * t) + 0.6 * np.sin(2 * np.pi * 1100 * t)
               + 0.3 * np.sin(2 * np.pi * 2600 * t))
    y = x + 0.3 * rng.standard_normal(len(x))
    np.testing.assert_allclose(M.stoi(x, y, SR, extended=True),
                               0.07400846906672583, atol=1e-9)
    np.testing.assert_allclose(M.stoi(x, y, SR, extended=False),
                               0.3928769107949052, atol=1e-9)


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
