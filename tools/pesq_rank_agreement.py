#!/usr/bin/env python
"""Rank-agreement study for the built-in P.862 scorer (VERDICT r3 item 9).

The built-in `sgmse_tpu.utils.p862.pesq` drives best-PESQ checkpoint
selection whenever the conformance `pesq` package is absent (reference
train.py:92-97 is what this protects). Selection only needs the scorer to
RANK checkpoints correctly, i.e. to be monotone in true degradation severity
— absolute calibration matters less. The certified implementation is not
installable offline, so this study quantifies the next-best thing: Spearman
rank correlation between KNOWN severity orderings and the builtin's scores,
across a dense grid of distortion families x levels x speakers — every
family certified PESQ is known (by published behavior) to order
monotonically.

Outputs a markdown table (pasted into docs/PARITY.md) and one JSON line.
Run: python tools/pesq_rank_agreement.py
"""
import json
import sys
from pathlib import Path

import numpy as np
from scipy.signal import butter, lfilter
from scipy.stats import spearmanr

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sgmse_tpu.utils.p862 import pesq  # noqa: E402

FS = 16000


def speech_like(seed: int, formants=None) -> np.ndarray:
    """Speech-shaped test signal: formant resonators + syllabic AM."""
    rng = np.random.default_rng(seed)
    n = FS * 4
    w = rng.standard_normal(n)
    b, a = butter(1, 50 / (FS / 2), "highpass")
    w = lfilter(b, a, w)
    x = np.zeros(n)
    formants = formants or [(500, 120, 1.0), (1200, 180, 0.7),
                            (2500, 300, 0.4), (3500, 400, 0.2)]
    for f0, bw, g in formants:
        r = np.exp(-np.pi * bw / FS)
        th = 2 * np.pi * f0 / FS
        x += g * lfilter([1], [1, -2 * r * np.cos(th), r * r], w)
    t = np.arange(n) / FS
    rate = 3.0 + (seed % 3)
    env = np.clip(np.sin(2 * np.pi * rate * t)
                  + 0.3 * np.sin(2 * np.pi * 1.1 * t + seed), 0, None) ** 1.5
    x = x * env
    return x / np.abs(x).max()


# --- distortion families: (name, levels ordered mild -> severe, apply fn) ---

def _awgn(x, snr_db, rng):
    nn = rng.standard_normal(len(x))
    nn *= np.sqrt((x ** 2).mean() / (nn ** 2).mean()) * 10 ** (-snr_db / 20)
    return x + nn


def _pink(x, snr_db, rng):
    nn = rng.standard_normal(len(x))
    # -3 dB/oct shaping via cumulative leaky integration
    b, a = [1.0], [1.0, -0.98]
    nn = lfilter(b, a, nn)
    nn *= np.sqrt((x ** 2).mean() / (nn ** 2).mean()) * 10 ** (-snr_db / 20)
    return x + nn


def _babble(x, snr_db, rng):
    nn = sum(speech_like(int(rng.integers(100, 10_000))) for _ in range(4))
    nn = nn[: len(x)]
    nn *= np.sqrt((x ** 2).mean() / (nn ** 2).mean()) * 10 ** (-snr_db / 20)
    return x + nn


def _lowpass(x, cutoff_hz, rng):
    b, a = butter(6, cutoff_hz / (FS / 2))
    return lfilter(b, a, x)


def _clip(x, lim, rng):
    c = np.clip(x, -lim, lim)
    return c / max(np.abs(c).max(), 1e-9)


def _mod(x, depth, rng):
    t = np.arange(len(x)) / FS
    return x * (1.0 - depth * 0.5 * (1 + np.sin(2 * np.pi * 7 * t)))


def _reverb(x, t60_s, rng):
    # exponential-decay noise tail convolution (synthetic room smearing)
    n = int(FS * t60_s)
    h = rng.standard_normal(n) * np.exp(-6.9 * np.arange(n) / n)
    h[0] = 1.0
    y = np.convolve(x, h)[: len(x)]
    return y / np.abs(y).max()


def _quant(x, bits, rng):
    q = 2.0 ** (bits - 1)
    return np.round(x * q) / q


def _dropout(x, frac, rng):
    y = x.copy()
    n_holes = int(frac * 40)
    for _ in range(n_holes):
        s = int(rng.integers(0, len(x) - FS // 50))
        y[s: s + FS // 50] = 0.0
    return y


FAMILIES = [
    ("white noise (SNR dB)", [40, 30, 25, 20, 15, 10, 5, 0], _awgn),
    ("pink noise (SNR dB)", [40, 30, 25, 20, 15, 10, 5, 0], _pink),
    ("babble noise (SNR dB)", [40, 30, 25, 20, 15, 10, 5, 0], _babble),
    ("lowpass (cutoff Hz)", [7000, 5000, 4000, 3000, 2000, 1000, 500], _lowpass),
    ("clipping (limit)", [0.7, 0.4, 0.2, 0.1, 0.05, 0.02], _clip),
    ("AM modulation (depth)", [0.1, 0.25, 0.4, 0.6, 0.8, 1.0], _mod),
    ("reverb tail (T60 s)", [0.05, 0.1, 0.2, 0.4, 0.8, 1.2], _reverb),
    ("quantization (bits)", [12, 10, 8, 6, 5, 4], _quant),
    ("frame dropouts (density)", [0.05, 0.1, 0.2, 0.4, 0.7, 1.0], _dropout),
]

SPEAKERS = [
    (1, None),
    (2, [(350, 100, 1.0), (900, 150, 0.8), (2200, 250, 0.5), (3300, 350, 0.2)]),
    (3, [(650, 140, 1.0), (1500, 200, 0.6), (2800, 320, 0.45), (3600, 420, 0.25)]),
]


def main():
    rows = []
    worst = 1.0
    for name, levels, fn in FAMILIES:
        rhos, score_ranges = [], []
        for seed, formants in SPEAKERS:
            x = speech_like(seed, formants)
            rng = np.random.default_rng(seed * 17 + 5)
            scores = [pesq(FS, x, fn(x, lv, rng), "wb") for lv in levels]
            rho = spearmanr(np.arange(len(levels)), scores).statistic
            rhos.append(-rho)  # severity index up => score should go down
            score_ranges.append((min(scores), max(scores)))
        rho_min = min(rhos)
        worst = min(worst, rho_min)
        lo = min(s[0] for s in score_ranges)
        hi = max(s[1] for s in score_ranges)
        rows.append((name, len(levels) * len(SPEAKERS),
                     np.mean(rhos), rho_min, lo, hi))

    print("| Distortion family | pairs | Spearman rho (mean) | rho (min) | score range |")
    print("|---|---|---|---|---|")
    for name, n, mean_r, min_r, lo, hi in rows:
        print(f"| {name} | {n} | {mean_r:.3f} | {min_r:.3f} | "
              f"{lo:.2f} - {hi:.2f} |")
    print()
    print(json.dumps({"families": len(rows), "worst_rho": round(float(worst), 4),
                      "speakers": len(SPEAKERS)}))


if __name__ == "__main__":
    main()
