"""Shared helpers for dataset-synthesis scripts.

Mirrors the mixing logic of the reference preprocessing scripts
(/root/reference/preprocessing/create_wsj0_chime3.py:66-84 and
create_wsj0_qut.py): draw SNR uniformly, pick a random noise crop, scale the
noise to the target power, add. Seeds and draw order are kept identical so the
synthesized corpora are reproducible bit-for-bit given the same inputs.
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sgmse_tpu.data.wav import read_wav, resample, write_wav  # noqa: E402


def load_mono(path, sr=None):
    """Load a wav as mono float at an optional target sample rate."""
    x, file_sr = read_wav(path)
    x = x[0]
    if sr is not None and file_sr != sr:
        x = resample(x, file_sr, sr)
        file_sr = sr
    return x.astype(np.float64), file_sr


def mix_at_random_snr(s: np.ndarray, noises, min_snr: float, max_snr: float):
    """One reference-equivalent mixing draw. Returns the noisy mixture.

    Draw order matches the reference exactly: snr, noise index, crop start.
    """
    snr_dB = np.random.uniform(min_snr, max_snr)
    noise_ind = np.random.randint(len(noises))
    speech_power = 1 / len(s) * np.sum(s**2)

    n = noises[noise_ind]
    start = np.random.randint(len(n) - len(s))
    n = n[start:start + len(s)]

    noise_power = 1 / len(n) * np.sum(n**2)
    noise_power_target = speech_power * np.power(10, -snr_dB / 10)
    k = noise_power_target / noise_power
    n = n * np.sqrt(k)
    return s + n


def make_split_dirs(target: str):
    """Create {target}/{split}/{clean,noisy} directories; return path dict."""
    out = {}
    for split in ("train", "valid", "test"):
        for kind in ("clean", "noisy"):
            p = Path(target) / split / kind
            p.mkdir(parents=True, exist_ok=True)
            out[(split, kind)] = p
    return out


def write_pair(paths, split, file_name, clean, noisy, sr):
    write_wav(paths[(split, "clean")] / file_name, clean.astype(np.float32), sr)
    write_wav(paths[(split, "noisy")] / file_name, noisy.astype(np.float32), sr)
