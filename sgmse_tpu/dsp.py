"""Signal-processing core: STFT/iSTFT, spectrogram compression transforms, padding.

This is the parity linchpin of the framework: every published SGMSE checkpoint was
trained against exactly these DSP conventions, so the semantics here match the
reference's torch implementations bit-for-bit (up to float rounding):

- STFT/iSTFT mirror ``torch.stft``/``torch.istft`` with ``center=True`` semantics
  (reference: /root/reference/sgmse/data_module.py:190-218): periodic Hann window,
  reflect-padding by ``n_fft//2`` on both sides, one-sided rFFT with
  ``n_fft//2 + 1`` bins, iSTFT via overlap-add with squared-window envelope
  normalization and `length` trimming.
- ``spec_fwd``/``spec_back`` are the magnitude-compression transforms
  ``|z|^e * exp(i angle(z)) * factor`` with defaults e=0.5, factor=0.15
  (reference: /root/reference/sgmse/data_module.py:162-188).
- ``pad_spec`` pads the time-frame axis to a multiple of 64
  (reference: /root/reference/sgmse/util/other.py:76-90).

Everything is pure jnp, jit-friendly (static shapes), and batched over arbitrary
leading dimensions. No host round-trips.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def get_window(window_type: str, window_length: int) -> jnp.ndarray:
    """Periodic window matching ``torch.hann_window(periodic=True)``.

    Reference: /root/reference/sgmse/data_module.py:13-19.
    """
    n = np.arange(window_length)
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / window_length))
    if window_type == "hann":
        w = hann
    elif window_type == "sqrthann":
        w = np.sqrt(hann)
    else:
        raise NotImplementedError(f"Window type {window_type} not implemented!")
    return jnp.asarray(w, dtype=jnp.float32)


def _frame_indices(num_frames: int, frame_length: int, hop_length: int) -> jnp.ndarray:
    return (
        jnp.arange(num_frames)[:, None] * hop_length
        + jnp.arange(frame_length)[None, :]
    )


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    center: bool = True,
) -> jnp.ndarray:
    """Short-time Fourier transform with ``torch.stft`` semantics.

    Args:
        x: real signal, shape ``(..., L)``.
    Returns:
        complex64 spectrogram of shape ``(..., n_fft//2 + 1, num_frames)``.
    """
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths, mode="reflect")
    length = x.shape[-1]
    num_frames = 1 + (length - n_fft) // hop_length
    idx = _frame_indices(num_frames, n_fft, hop_length)
    frames = x[..., idx] * window  # (..., num_frames, n_fft)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    return jnp.swapaxes(spec, -1, -2).astype(jnp.complex64)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    length: Optional[int] = None,
    center: bool = True,
) -> jnp.ndarray:
    """Inverse STFT with ``torch.istft`` least-squares overlap-add semantics.

    Args:
        spec: complex spectrogram ``(..., n_fft//2 + 1, num_frames)``.
        length: if given, the output is trimmed/zero-padded to exactly this
            length. DOCUMENTED DIVERGENCE from ``torch.istft``: torch raises
            when ``length`` exceeds the reconstructable sample count, while
            this zero-pads the tail. Raising would be a trace-time error on a
            value the pipeline always keeps in range (lengths are derived from
            the forward STFT); the extension is deliberate and benign.
    Returns:
        real signal ``(..., L)``.
    """
    frames_spec = jnp.swapaxes(spec, -1, -2)  # (..., T, F)
    frames = jnp.fft.irfft(frames_spec, n=n_fft, axis=-1).astype(jnp.float32) * window
    num_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (num_frames - 1)
    idx = _frame_indices(num_frames, n_fft, hop_length)

    out = jnp.zeros(frames.shape[:-2] + (out_len,), dtype=jnp.float32)
    out = out.at[..., idx].add(frames)

    # Squared-window envelope for least-squares normalization (NOLA).
    env = jnp.zeros((out_len,), dtype=jnp.float32)
    env = env.at[idx.reshape(-1)].add(jnp.broadcast_to(window**2, idx.shape).reshape(-1))
    out = out / jnp.where(env > 1e-11, env, 1.0)

    if center:
        start = n_fft // 2
    else:
        start = 0
    if length is None:
        end = out_len - (n_fft // 2 if center else 0)
        return out[..., start:end]
    avail = out_len - start
    if length <= avail:
        return out[..., start : start + length]
    pad_widths = [(0, 0)] * (out.ndim - 1) + [(0, length - avail)]
    return jnp.pad(out[..., start:], pad_widths)


def spec_fwd(
    spec: jnp.ndarray,
    transform_type: str = "exponent",
    spec_factor: float = 0.15,
    spec_abs_exponent: float = 0.5,
) -> jnp.ndarray:
    """Forward magnitude-compression transform (reference data_module.py:162-175)."""
    if transform_type == "exponent":
        if spec_abs_exponent != 1:
            e = spec_abs_exponent
            mag = jnp.abs(spec)
            # |z|^e * exp(i*angle(z)) == |z|^(e-1) * z  (and 0 stays 0)
            scale = jnp.where(mag > 0, mag ** (e - 1.0), 0.0)
            spec = spec * scale
        return spec * spec_factor
    elif transform_type == "log":
        mag = jnp.abs(spec)
        scale = jnp.where(mag > 0, jnp.log1p(mag) / mag, 0.0)
        return spec * scale * spec_factor
    elif transform_type == "none":
        return spec
    raise ValueError(f"Unknown transform_type {transform_type}")


def spec_back(
    spec: jnp.ndarray,
    transform_type: str = "exponent",
    spec_factor: float = 0.15,
    spec_abs_exponent: float = 0.5,
) -> jnp.ndarray:
    """Inverse of :func:`spec_fwd` (reference data_module.py:177-188)."""
    if transform_type == "exponent":
        spec = spec / spec_factor
        if spec_abs_exponent != 1:
            e = spec_abs_exponent
            mag = jnp.abs(spec)
            scale = jnp.where(mag > 0, mag ** (1.0 / e - 1.0), 0.0)
            spec = spec * scale
        return spec
    elif transform_type == "log":
        spec = spec / spec_factor
        mag = jnp.abs(spec)
        scale = jnp.where(mag > 0, jnp.expm1(mag) / mag, 0.0)
        return spec * scale
    elif transform_type == "none":
        return spec
    raise ValueError(f"Unknown transform_type {transform_type}")


def pad_spec(spec: jnp.ndarray, mode: str = "zero_pad", multiple: int = 64) -> jnp.ndarray:
    """Pad the last (time-frame) axis to a multiple of `multiple`.

    Reference: /root/reference/sgmse/util/other.py:76-90. Modes map to the
    reference's ZeroPad2d / ReflectionPad2d / ReplicationPad2d on the T axis.
    """
    t = spec.shape[-1]
    num_pad = (-t) % multiple
    if num_pad == 0:
        return spec
    pad_widths = [(0, 0)] * (spec.ndim - 1) + [(0, num_pad)]
    if mode == "zero_pad":
        return jnp.pad(spec, pad_widths, mode="constant")
    elif mode == "reflection":
        return jnp.pad(spec, pad_widths, mode="reflect")
    elif mode == "replication":
        return jnp.pad(spec, pad_widths, mode="edge")
    raise NotImplementedError(f"pad mode {mode} not implemented")


class SpecTransform:
    """Bundles STFT config + compression transform, mirroring the DSP surface the
    reference exposes on its data module (/root/reference/sgmse/data_module.py:104-218).

    All methods are pure and jit-friendly; this object is hashable static state.
    """

    def __init__(
        self,
        n_fft: int = 510,
        hop_length: int = 128,
        window: str = "hann",
        transform_type: str = "exponent",
        spec_factor: float = 0.15,
        spec_abs_exponent: float = 0.5,
        num_frames: int = 256,
    ):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.window_type = window
        self.window = get_window(window, n_fft)
        self.transform_type = transform_type
        self.spec_factor = spec_factor
        self.spec_abs_exponent = spec_abs_exponent
        self.num_frames = num_frames

    # --- waveform <-> complex spectrogram -------------------------------------------------
    def stft(self, sig: jnp.ndarray) -> jnp.ndarray:
        return stft(sig, self.n_fft, self.hop_length, self.window)

    def istft(self, spec: jnp.ndarray, length: Optional[int] = None) -> jnp.ndarray:
        return istft(spec, self.n_fft, self.hop_length, self.window, length=length)

    # --- compression transform ------------------------------------------------------------
    def spec_fwd(self, spec: jnp.ndarray) -> jnp.ndarray:
        return spec_fwd(spec, self.transform_type, self.spec_factor, self.spec_abs_exponent)

    def spec_back(self, spec: jnp.ndarray) -> jnp.ndarray:
        return spec_back(spec, self.transform_type, self.spec_factor, self.spec_abs_exponent)

    # --- convenience ----------------------------------------------------------------------
    def wav_to_spec(self, sig: jnp.ndarray) -> jnp.ndarray:
        return self.spec_fwd(self.stft(sig))

    def spec_to_wav(self, spec: jnp.ndarray, length: Optional[int] = None) -> jnp.ndarray:
        return self.istft(self.spec_back(spec), length=length)

    @property
    def num_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def target_len(self) -> int:
        """Training crop length in samples (data_module.py:62)."""
        return (self.num_frames - 1) * self.hop_length

    def config_dict(self) -> dict:
        return dict(
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            window=self.window_type,
            transform_type=self.transform_type,
            spec_factor=self.spec_factor,
            spec_abs_exponent=self.spec_abs_exponent,
            num_frames=self.num_frames,
        )
