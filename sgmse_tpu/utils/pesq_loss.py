"""Differentiable PESQ training loss in JAX.

Capability parity with the reference's optional PESQ loss term (C29): the
reference wires the external `torch_pesq.PesqLoss` into the data-prediction
loss when ``--pesq_weight > 0`` (reference model.py:19, 83-86, 176-183;
README.md:93 uses 5e-4 for the Schrödinger-bridge recipe). This module is a
from-scratch JAX implementation of the same idea: a differentiable
approximation of ITU-T P.862 (PESQ) quality, usable as a training
regularizer.

It follows the P.862 perceptual model structure:

  1. 16 kHz operation, level alignment to a standard listening level,
  2. Hann STFT (512-sample frames, 50% overlap),
  3. Bark-scale filterbank (49 bands, Zwicker Bark warping),
  4. per-band frequency-response equalization of the reference and
     per-frame gain equalization of the degraded signal (both clamped),
  5. Zwicker-law intensity->loudness transform,
  6. masked symmetric + asymmetric disturbance densities,
  7. L6-over-syllables / L2-over-time aggregation,
  8. MOS = 4.5 - 0.1 * d_sym - 0.0309 * d_asym.

Unlike the ITU reference code there is no time-alignment stage: training
pairs (clean target, model output) are sample-aligned by construction — the
same operating assumption `torch_pesq` makes. Constants (band thresholds,
clamps, exponents) follow P.862 but this is an *approximation* suitable as a
differentiable loss, not a replacement for the `pesq` conformance metric
(utils/metrics.py gates that separately).

Everything is fixed-shape jnp so the loss fuses into the jitted train step;
the Bark filterbank is one (F, 49) matmul on the MXU.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12

# P.862 operating constants (16 kHz mode).
_SR = 16000
_NFFT = 512
_HOP = 256
_NBARK = 49
_ZWICKER_POWER = 0.23
# Standard listening level target for the level-alignment stage (P.862 scales
# speech to 79 dB SPL; expressed here as a target mean band power).
_TARGET_POWER = 1e7


def _bark_scale(f_hz: np.ndarray) -> np.ndarray:
    """Zwicker Bark warping z(f) = 13 atan(0.00076 f) + 3.5 atan((f/7500)^2)."""
    return 13.0 * np.arctan(0.00076 * f_hz) + 3.5 * np.arctan((f_hz / 7500.0) ** 2)


def _make_filterbank() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rectangular Bark filterbank (F_bins, 49), band widths, band centers (Hz)."""
    freqs = np.fft.rfftfreq(_NFFT, d=1.0 / _SR)  # (257,)
    z = _bark_scale(freqs)
    z_max = _bark_scale(np.array([_SR / 2.0]))[0]
    edges = np.linspace(0.0, z_max, _NBARK + 1)
    fb = np.zeros((freqs.shape[0], _NBARK), dtype=np.float32)
    for b in range(_NBARK):
        in_band = (z >= edges[b]) & (z < edges[b + 1])
        if not in_band.any():  # guarantee every band sees >= 1 bin
            idx = np.argmin(np.abs(z - 0.5 * (edges[b] + edges[b + 1])))
            fb[idx, b] = 1.0
        else:
            fb[in_band, b] = 1.0
    # Normalize so each band reports mean bin power (keeps magnitudes comparable).
    fb = fb / np.maximum(fb.sum(axis=0, keepdims=True), 1.0)
    widths = np.diff(edges).astype(np.float32)  # Bark width per band (uniform here)
    centers_z = 0.5 * (edges[:-1] + edges[1:])
    # Invert z(f) numerically for the band centers.
    fine = np.linspace(0.0, _SR / 2.0, 4096)
    centers_hz = np.interp(centers_z, _bark_scale(fine), fine).astype(np.float32)
    return fb, widths, centers_hz


_FB, _WIDTHS, _CENTERS_HZ = _make_filterbank()

# Absolute hearing threshold per band, diffuse-field approximation (dB SPL ->
# power on the internal scale). Piecewise fit of the ISO 389-7 threshold curve.
def _abs_threshold_db(f_hz: np.ndarray) -> np.ndarray:
    f = np.maximum(f_hz, 20.0) / 1000.0
    return (3.64 * f ** -0.8
            - 6.5 * np.exp(-0.6 * (f - 3.3) ** 2)
            + 1e-3 * f ** 4)


_P0 = (10.0 ** (_abs_threshold_db(_CENTERS_HZ) / 10.0)).astype(np.float32)


def _stft_power(x: jnp.ndarray) -> jnp.ndarray:
    """Hann STFT power spectrogram, (B, T, F). Center-padded frames."""
    win = jnp.asarray(np.hanning(_NFFT + 1)[:-1].astype(np.float32))
    pad = _NFFT // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    n_frames = 1 + (x.shape[-1] - _NFFT) // _HOP
    idx = jnp.arange(n_frames)[:, None] * _HOP + jnp.arange(_NFFT)[None, :]
    frames = x[:, idx] * win  # (B, T, NFFT)
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec) ** 2


class PesqLoss:
    """Differentiable PESQ-structure loss: ``loss(ref, deg) -> (B,)``.

    API mirrors torch_pesq.PesqLoss: construct with a scale ``factor`` and
    ``sample_rate``; call returns ``factor * (4.5 - mos)`` per utterance
    (decreasing in quality, ~0 for identical signals); ``mos`` exposes the
    raw quality estimate in [1.0, 4.64].
    """

    def __init__(self, factor: float, sample_rate: int = 16000):
        if sample_rate != _SR:
            raise ValueError(
                f"PesqLoss operates at 16 kHz (got sr={sample_rate}); resample "
                "the training pairs or disable --pesq_weight for other rates.")
        self.factor = factor

    # -- perceptual model -----------------------------------------------------------
    @staticmethod
    def _loudness(bark_pow: jnp.ndarray) -> jnp.ndarray:
        """Zwicker intensity->loudness per band (B, T, 49)."""
        p0 = jnp.asarray(_P0)
        ratio = bark_pow / p0
        sl = (p0 / 0.5) ** _ZWICKER_POWER
        loud = sl * ((0.5 + 0.5 * ratio) ** _ZWICKER_POWER - 1.0)
        return jnp.maximum(loud, 0.0)

    def _disturbance(self, ref: jnp.ndarray, deg: jnp.ndarray):
        """Bark powers -> (d_sym, d_asym) aggregated per utterance."""
        # Active-speech weighting from the *reference* frame power: a smooth
        # (differentiable) gate standing in for P.862's hard silent-frame
        # exclusion — frames 40 dB below the utterance peak get ~0 weight.
        frame_pow = jnp.sum(ref, axis=-1)  # (B, T)
        peak = jnp.max(frame_pow, axis=-1, keepdims=True)
        active = jax.nn.sigmoid(
            2.0 * (jnp.log10(frame_pow + _EPS) - jnp.log10(peak * 1e-4 + _EPS)))

        # Frequency-response equalization: per-band mean power ratio, clamped
        # (P.862 clamps the partial compensation factor to [0.01, 100]).
        mean_ref = jnp.mean(ref, axis=1, keepdims=True)
        mean_deg = jnp.mean(deg, axis=1, keepdims=True)
        band_eq = jnp.clip((mean_deg + 1000.0) / (mean_ref + 1000.0), 0.01, 100.0)
        ref_eq = ref * band_eq

        # Per-frame gain equalization of the degraded signal, clamped
        # (P.862 clamps to [3e-4, 5]).
        num = jnp.sum(ref_eq, axis=-1, keepdims=True) + 5e3
        den = jnp.sum(deg, axis=-1, keepdims=True) + 5e3
        gain = jnp.clip(num / den, 3e-4, 5.0)
        deg_eq = deg * gain

        l_ref = self._loudness(ref_eq)
        l_deg = self._loudness(deg_eq)

        # Masked disturbance density.
        d = l_deg - l_ref
        m = 0.25 * jnp.minimum(l_deg, l_ref)
        d = jnp.sign(d) * jnp.maximum(jnp.abs(d) - m, 0.0)

        widths = jnp.asarray(_WIDTHS)
        # Symmetric disturbance: width-weighted L2 over bands (per frame).
        # _EPS inside the root: the masked density `d` is EXACTLY zero
        # wherever |l_deg - l_ref| <= mask (and everywhere when deg == ref),
        # and d/dx sqrt(x) -> inf at x=0 — without the guard the loss VALUE is
        # finite but its GRADIENT is NaN, which silently NaN'd the whole
        # data_prediction training run one optimizer step later.
        d_sym = jnp.sqrt(jnp.sum((d ** 2) * widths, axis=-1) /
                         (jnp.sum(widths)) + _EPS)  # (B, T)

        # Asymmetric disturbance: penalize additive distortions more.
        asym = ((deg_eq + 50.0) / (ref_eq + 50.0)) ** 1.2
        asym = jnp.where(asym < 3.0, 0.0, jnp.minimum(asym, 12.0))
        d_asym = jnp.sum(jnp.abs(d) * asym * widths, axis=-1) / (jnp.sum(widths) + _EPS)

        def aggregate(dens):
            b, t = dens.shape
            # L6 over ~320 ms syllable blocks (20 frames at 16 ms hop), then L2.
            blk = 20
            t_pad = (-t) % blk
            padded = jnp.pad(dens, ((0, 0), (0, t_pad)))
            w = jnp.pad(active, ((0, 0), (0, t_pad)))
            blocks = padded.reshape(b, -1, blk)
            wb = w.reshape(b, -1, blk)
            # Same zero-gradient hazard as d_sym: x^(1/6) and sqrt(x) have
            # infinite slope at x=0, and all-silent (or fully-masked) blocks
            # produce exact zeros. The epsilon biases l6 by (1e-12)^(1/6)=1e-2
            # — negligible against disturbance magnitudes of O(1..100).
            l6 = (jnp.sum(wb * blocks ** 6, axis=-1)
                  / (jnp.sum(wb, axis=-1) + _EPS) + _EPS) ** (1.0 / 6.0)
            l2 = jnp.sqrt(jnp.mean(l6 ** 2, axis=-1) + _EPS)
            return l2

        return aggregate(d_sym), aggregate(d_asym)

    def _bark_powers(self, ref: jnp.ndarray, deg: jnp.ndarray):
        # Level alignment: scale both signals so the reference band power hits
        # the standard listening level.
        p_ref = jnp.mean(ref ** 2, axis=-1, keepdims=True)
        scale = jnp.sqrt(_TARGET_POWER / (p_ref * _SR / 2.0 + _EPS))
        ref = ref * scale
        deg = deg * scale
        fb = jnp.asarray(_FB)
        ref_bark = jnp.einsum("btf,fk->btk", _stft_power(ref), fb)
        deg_bark = jnp.einsum("btf,fk->btk", _stft_power(deg), fb)
        return ref_bark, deg_bark

    def mos(self, ref: jnp.ndarray, deg: jnp.ndarray) -> jnp.ndarray:
        """Raw PESQ-style MOS per utterance, clipped to [1.0, 4.64]."""
        squeeze = ref.ndim == 1
        if squeeze:
            ref, deg = ref[None], deg[None]
        ref_bark, deg_bark = self._bark_powers(ref, deg)
        d_sym, d_asym = self._disturbance(ref_bark, deg_bark)
        raw = 4.5 - 0.1 * d_sym - 0.0309 * d_asym
        raw = jnp.clip(raw, 1.0, 4.64)
        return raw[0] if squeeze else raw

    def __call__(self, ref: jnp.ndarray, deg: jnp.ndarray) -> jnp.ndarray:
        """Per-utterance loss, factor * (4.5 - mos). Differentiable in `deg`."""
        squeeze = ref.ndim == 1
        if squeeze:
            ref, deg = ref[None], deg[None]
        ref_bark, deg_bark = self._bark_powers(ref, deg)
        d_sym, d_asym = self._disturbance(ref_bark, deg_bark)
        loss = self.factor * (0.1 * d_sym + 0.0309 * d_asym)
        return loss[0] if squeeze else loss
