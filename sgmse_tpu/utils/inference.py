"""In-training evaluation helper: enhance validation files and compute metrics.

Capability parity with /root/reference/sgmse/util/inference.py:16-63
(evaluate_model): uniform file subsampling over the validation set, per-file
PC-sampler enhancement (N=30, snr=0.5, 1 corrector step), mean PESQ / SI-SDR /
ESTOI. PESQ is gated (NaN when the C library is absent, see utils/metrics.py).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from ..data.wav import read_wav, resample
from .metrics import pesq_wb, si_sdr, stoi

# Reference settings (util/inference.py:10-13)
EVAL_SR = 16000
EVAL_SNR = 0.5
EVAL_N = 30
EVAL_CORRECTOR_STEPS = 1


def target_sr_and_pad(backbone: str) -> Tuple[int, str]:
    """Backbone-name dispatch for inference IO: (target sample rate, spec pad
    mode). Mirrors the reference's enhancement-time dispatch
    (enhancement.py:45-54): the 48 kHz model runs at 48 kHz with reflection
    padding, ncsnpp_v2 at 16 kHz with reflection padding, everything else at
    16 kHz with zero padding."""
    if backbone == "ncsnpp_48k":
        return 48000, "reflection"
    if backbone == "ncsnpp_v2":
        return 16000, "reflection"
    return 16000, "zero_pad"


def select_eval_files(clean_files: Sequence[str], noisy_files: Sequence[str],
                      num_eval_files: int) -> Tuple[list, list]:
    """Uniform subsampling across the validation set (reference inference.py:21-25)."""
    total = len(clean_files)
    indices = np.linspace(0, total - 1, num_eval_files).astype(int)
    return [clean_files[i] for i in indices], [noisy_files[i] for i in indices]


def shard_eval_files(files: list, process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> list:
    """Split eval files across hosts; last host takes the remainder
    (parity with reference model.py:208-223 rank sharding)."""
    rank = jax.process_index() if process_index is None else process_index
    world = jax.process_count() if process_count is None else process_count
    per = len(files) // world
    if rank == world - 1:
        return files[rank * per:]
    return files[rank * per:(rank + 1) * per]


def evaluate_model(model, variables, clean_files: Sequence[str],
                   noisy_files: Sequence[str], num_eval_files: int,
                   key=None, N: int = EVAL_N, snr: float = EVAL_SNR,
                   corrector_steps: int = EVAL_CORRECTOR_STEPS,
                   sr: Optional[int] = None, batch_size: int = 4,
                   return_sums: bool = False) -> Dict[str, float]:
    """Enhance `num_eval_files` files and return mean pesq/si_sdr/estoi.

    Files are bucketed by padded spectrogram length and enhanced batched
    (``batch_size`` utterances per jitted program call) — the reference runs
    one N-step sampler per file (inference.py:36-45); same math, better
    device utilization. Metrics are still computed per file on the host.

    Accumulation is NaN-aware per metric (a silent clip scoring NaN PESQ is
    skipped for that metric only, like the NaN-robust mean_std elsewhere).
    With ``return_sums=True`` the dict instead holds ``{metric: (sum, count)}``
    so callers can reduce across hosts before taking the mean (the analogue of
    the reference's ``sync_dist=True``, model.py:202).
    """
    import numpy as np

    if key is None:
        key = jax.random.key(0)
    sr = sr if sr is not None else model.sr
    clean_sel, noisy_sel = select_eval_files(clean_files, noisy_files, num_eval_files)

    # Load all pairs, bucket by padded frame count (same scheme as the CLI).
    hop = model.spec.hop_length
    buckets: Dict[int, list] = {}
    for clean_file, noisy_file in zip(clean_sel, noisy_sel):
        x, sr_x = read_wav(clean_file)
        y, sr_y = read_wav(noisy_file)
        assert sr_x == sr_y, "Sample rates of clean and noisy files do not match!"
        x, y = x[0], y[0]
        frames = 1 + len(y) // hop
        padded = -(-frames // 64) * 64
        buckets.setdefault(padded, []).append((x, y, sr_x))

    sums = {"pesq": [0.0, 0], "si_sdr": [0.0, 0], "estoi": [0.0, 0]}

    def _accumulate(name, value):
        value = float(value)
        # Only NaN means "metric unavailable for this clip"; +inf SI-SDR
        # (bit-exact reconstruction) is a real score and must stay in the
        # mean (an inf mean is honest; silently dropping the best possible
        # score is not).
        if not np.isnan(value):
            sums[name][0] += value
            sums[name][1] += 1

    for padded in sorted(buckets):
        group = buckets[padded]
        for i in range(0, len(group), batch_size):
            chunk = group[i:i + batch_size]
            maxlen = max(len(y) for _, y, _ in chunk)
            yb = np.stack([np.pad(y, (0, maxlen - len(y))) for _, y, _ in chunk])
            key, sub = jax.random.split(key)
            # enhance_eval: params are ARGUMENTS of one fused jitted program,
            # so the sampler compiles once and is reused as training updates
            # the params every validation — enhance() would rebuild and
            # remote-recompile its params-by-closure programs per validation
            # (~350 s at the 65M flagship size, docs/PERFORMANCE.md).
            x_hat_b = model.enhance_eval(variables, yb, key=sub, N=N, snr=snr,
                                         corrector_steps=corrector_steps)
            for (x, y, sr_x), x_hat_padded in zip(chunk, x_hat_b):
                x_hat = np.asarray(x_hat_padded)[: len(y)]
                x_16k = resample(x, sr_x, 16000) if sr_x != 16000 else x
                x_hat_16k = resample(x_hat, sr, 16000) if sr != 16000 else x_hat
                _accumulate("pesq", pesq_wb(16000, x_16k, x_hat_16k, "wb"))
                _accumulate("si_sdr", si_sdr(x, x_hat))
                _accumulate("estoi", stoi(x, x_hat, sr_x, extended=True))

    if return_sums:
        return {k: (s, c) for k, (s, c) in sums.items()}
    return {k: (s / c if c else float("nan")) for k, (s, c) in sums.items()}
