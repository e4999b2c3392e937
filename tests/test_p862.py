"""Tests for the built-in P.862-structured PESQ metric (sgmse_tpu/utils/p862.py).

Ground truth for the conformance implementation is unavailable offline, so
validation is anchor- and behavior-based:
  * identical signals must land on the exact P.862.1/.2 mapping ceilings
    (nb 4.5486, wb 4.6439) — the same values the `pesq` C package returns,
  * scores must be strictly monotone in additive-noise SNR,
  * absolute positioning must follow published PESQ-vs-SNR behavior,
  * the time aligner must absorb constant delays,
  * both sample rates and both modes must work; invalid combos must raise.
"""
import numpy as np
import pytest
from scipy.signal import butter, lfilter, resample_poly

from sgmse_tpu.utils import metrics as M
from sgmse_tpu.utils.p862 import pesq

FS = 16000


@pytest.fixture(scope="module")
def speech():
    """Deterministic speech-shaped signal: formant resonators + syllabic AM."""
    rng = np.random.default_rng(1)
    n = FS * 4
    w = rng.standard_normal(n)
    b, a = butter(1, 50 / (FS / 2), "highpass")
    w = lfilter(b, a, w)
    x = np.zeros(n)
    for f0, bw, g in [(500, 120, 1.0), (1200, 180, 0.7),
                      (2500, 300, 0.4), (3500, 400, 0.2)]:
        r = np.exp(-np.pi * bw / FS)
        th = 2 * np.pi * f0 / FS
        x += g * lfilter([1], [1, -2 * r * np.cos(th), r * r], w)
    t = np.arange(n) / FS
    env = np.clip(np.sin(2 * np.pi * 4 * t)
                  + 0.3 * np.sin(2 * np.pi * 1.1 * t + 1), 0, None) ** 1.5
    x = x * env
    return x / np.abs(x).max()


def _noisy(x, snr_db, seed=0):
    rng = np.random.default_rng(seed)
    nn = rng.standard_normal(len(x))
    nn *= np.sqrt((x ** 2).mean() / (nn ** 2).mean()) * 10 ** (-snr_db / 20)
    return x + nn


def test_identity_anchors(speech):
    # The known ceilings of the P.862.1/.2 MOS-LQO mappings at raw = 4.5 —
    # identical to what the conformance package returns for ref == deg.
    assert pesq(FS, speech, speech, "wb") == pytest.approx(4.6439, abs=0.005)
    assert pesq(FS, speech, speech, "nb") == pytest.approx(4.5486, abs=0.005)
    x8 = resample_poly(speech, 1, 2)
    assert pesq(8000, x8, x8, "nb") == pytest.approx(4.5486, abs=0.005)


def test_snr_monotonicity(speech):
    for mode in ("wb", "nb"):
        scores = [pesq(FS, speech, _noisy(speech, s), mode)
                  for s in (40, 30, 20, 10, 0)]
        assert all(a > b for a, b in zip(scores, scores[1:])), (mode, scores)


def test_absolute_positioning(speech):
    """Scores land in the published PESQ-vs-SNR ballpark for white noise."""
    assert 3.2 <= pesq(FS, speech, _noisy(speech, 30), "wb") <= 4.3
    assert 2.0 <= pesq(FS, speech, _noisy(speech, 20), "wb") <= 3.0
    assert 1.2 <= pesq(FS, speech, _noisy(speech, 10), "wb") <= 2.2
    assert 1.0 <= pesq(FS, speech, _noisy(speech, 0), "wb") <= 1.6


def test_delay_invariance(speech):
    delayed = np.concatenate([np.zeros(163), speech])[: len(speech)]
    assert pesq(FS, speech, delayed, "wb") > 4.5


def test_distortion_sensitivity(speech):
    scores = []
    for lim in (0.3, 0.05, 0.02):  # increasing clipping severity
        clipped = np.clip(speech, -lim, lim)
        scores.append(pesq(FS, speech, clipped / np.abs(clipped).max(), "wb"))
    assert scores[0] > scores[1] > scores[2], scores
    assert scores[2] < 3.0  # severe clipping is clearly penalized
    # losing the band above 1 kHz hurts nb less than wb
    b, a = butter(4, 1000 / (FS / 2))
    lp = lfilter(b, a, speech)
    assert pesq(FS, speech, lp, "nb") >= pesq(FS, speech, lp, "wb") - 0.3


def test_invalid_modes(speech):
    with pytest.raises(ValueError):
        pesq(8000, speech, speech, "wb")  # wb requires 16 kHz
    with pytest.raises(ValueError):
        pesq(44100, speech, speech, "nb")
    with pytest.raises(ValueError):
        pesq(FS, speech[:100], speech[:100], "wb")  # too short


def test_metrics_fallback_is_live(speech):
    """pesq_wb must return a real score in this environment (no `pesq` pkg),
    so the best-PESQ checkpoint policy and validation logging actually fire."""
    val = M.pesq_wb(FS, speech, _noisy(speech, 15))
    assert np.isfinite(val) and 1.0 <= val <= 4.7
    ident = M.pesq_wb(FS, speech, speech)
    assert ident == pytest.approx(4.6439, abs=0.005) or ident == pytest.approx(4.64, abs=0.01)


def test_tail_distortion_is_scored(speech):
    """A noise burst confined to the final 125 ms must lower the score: the
    syllable aggregation anchors a last window at the signal end instead of
    dropping up to HOP-1 trailing frames (round-2 review finding — before the
    fix this scored 4.643, indistinguishable from identity)."""
    deg = speech.copy()
    rng = np.random.default_rng(7)
    deg[-FS // 8:] = deg[-FS // 8:] + 5.0 * rng.standard_normal(FS // 8)
    assert pesq(FS, speech, deg, "wb") < 4.3


def test_silent_reference_raises_and_maps_to_nan():
    """A reference with no speech activity has no utterances to score: the
    conformance package raises NoUtterancesError; the builtin raises
    ValueError and pesq_wb maps it to NaN (round-2 review finding — before
    the fix a silent pair scored the 4.6439 ceiling, inflating validation
    means and best-PESQ checkpoint selection)."""
    z = np.zeros(FS)
    with pytest.raises(ValueError):
        pesq(FS, z, z, "wb")
    assert np.isnan(M.pesq_wb(FS, z, z))


def test_rank_agreement_families(speech):
    """Compact regression guard for the round-4 rank-agreement study
    (tools/pesq_rank_agreement.py, table in docs/PARITY.md): severity
    orderings within deterministic distortion families must rank perfectly —
    that is the property best-PESQ checkpoint selection relies on."""
    t = np.arange(len(speech)) / FS

    def am(depth):
        return speech * (1.0 - depth * 0.5 * (1 + np.sin(2 * np.pi * 7 * t)))

    def quant(bits):
        q = 2.0 ** (bits - 1)
        return np.round(speech * q) / q

    for name, degs in [
        ("am", [am(d) for d in (0.1, 0.4, 0.8)]),
        ("quant", [quant(b) for b in (10, 6, 4)]),
    ]:
        scores = [pesq(FS, speech, d, "wb") for d in degs]
        assert scores[0] > scores[1] > scores[2], (name, scores)
