"""DSP parity tests: STFT/iSTFT vs torch oracles, transform inverses, pad_spec."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sgmse_tpu import dsp


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _torch_stft(x, n_fft, hop):
    w = torch.hann_window(n_fft, periodic=True)
    return torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop, window=w,
                      center=True, return_complex=True)


@pytest.mark.parametrize("n_fft,hop,length", [
    (510, 128, 32640),   # default 16 kHz config (data_module.py:109-111)
    (510, 128, 20000),
    (1534, 384, 48000),  # 48 kHz config (README.md:89)
    (512, 128, 16384),   # DCUNet config
])
def test_stft_matches_torch(rng, n_fft, hop, length):
    x = rng.standard_normal(length).astype(np.float32)
    ref = _torch_stft(x, n_fft, hop).numpy()
    got = np.asarray(dsp.stft(jnp.asarray(x), n_fft, hop, dsp.get_window("hann", n_fft)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_stft_batched(rng):
    x = rng.standard_normal((3, 2, 8000)).astype(np.float32)
    win = dsp.get_window("hann", 510)
    got = dsp.stft(jnp.asarray(x), 510, 128, win)
    ref = np.stack([
        np.stack([np.asarray(dsp.stft(jnp.asarray(x[i, j]), 510, 128, win)) for j in range(2)])
        for i in range(3)
    ])
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


@pytest.mark.parametrize("n_fft,hop,length", [(510, 128, 32640), (1534, 384, 48000)])
def test_istft_matches_torch(rng, n_fft, hop, length):
    x = rng.standard_normal(length).astype(np.float32)
    spec = _torch_stft(x, n_fft, hop)
    w = torch.hann_window(n_fft, periodic=True)
    ref = torch.istft(spec, n_fft=n_fft, hop_length=hop, window=w, center=True,
                      length=length).numpy()
    got = np.asarray(dsp.istft(jnp.asarray(spec.numpy()), n_fft, hop,
                               dsp.get_window("hann", n_fft), length=length))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_stft_istft_roundtrip(rng):
    x = rng.standard_normal(20000).astype(np.float32)
    tr = dsp.SpecTransform()
    spec = tr.stft(jnp.asarray(x))
    back = np.asarray(tr.istft(spec, length=20000))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_spec_transform_inverse(rng):
    z = (rng.standard_normal((256, 64)) + 1j * rng.standard_normal((256, 64))).astype(np.complex64)
    for ttype in ("exponent", "log", "none"):
        tr = dsp.SpecTransform(transform_type=ttype)
        fwd = tr.spec_fwd(jnp.asarray(z))
        back = np.asarray(tr.spec_back(fwd))
        np.testing.assert_allclose(back, z, atol=1e-4)


def test_spec_fwd_matches_reference_formula(rng):
    """|z|^e * exp(i angle z) * factor (data_module.py:162-169)."""
    z = (rng.standard_normal((16, 8)) + 1j * rng.standard_normal((16, 8))).astype(np.complex64)
    e, factor = 0.5, 0.15
    ref = np.abs(z) ** e * np.exp(1j * np.angle(z)) * factor
    got = np.asarray(dsp.spec_fwd(jnp.asarray(z), "exponent", factor, e))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pad_spec():
    x = jnp.ones((1, 1, 256, 70), dtype=jnp.complex64)
    for mode in ("zero_pad", "reflection", "replication"):
        out = dsp.pad_spec(x, mode=mode)
        assert out.shape[-1] == 128
    # already-multiple stays untouched
    x64 = jnp.ones((1, 1, 256, 64), dtype=jnp.complex64)
    assert dsp.pad_spec(x64).shape[-1] == 64
    # zero pad adds zeros at the end
    out = np.asarray(dsp.pad_spec(x, mode="zero_pad"))
    assert np.all(out[..., 70:] == 0)


def test_window_matches_torch():
    for n in (510, 1534, 512):
        ref = torch.hann_window(n, periodic=True).numpy()
        got = np.asarray(dsp.get_window("hann", n))
        np.testing.assert_allclose(got, ref, atol=1e-6)
        ref_sqrt = torch.sqrt(torch.hann_window(n, periodic=True)).numpy()
        got_sqrt = np.asarray(dsp.get_window("sqrthann", n))
        # torch computes hann in float32 then sqrts; we use float64 internally,
        # so tiny near-zero values differ at ~2e-6 absolute (we are more accurate).
        np.testing.assert_allclose(got_sqrt, ref_sqrt, atol=5e-6)


class TestResampleParity:
    """Bounded-error tests for data/wav.py resample (VERDICT item: the reference
    CLIs use librosa.resample kaiser_best, reference enhancement.py:64; we use a
    polyphase filter). librosa is not installable here, so we bound the error
    against *analytic* bandlimited ground truth instead: both resamplers are
    near-ideal lowpass interpolators, so an error bound of each vs the true
    bandlimited signal bounds their mutual divergence by the triangle
    inequality."""

    def _bandlimited(self, sr, seconds=1.0, freqs=(440.0, 1333.0, 3010.5)):
        t = np.arange(int(sr * seconds)) / sr
        x = sum(np.sin(2 * np.pi * f * t + 0.1 * i)
                for i, f in enumerate(freqs))
        return (x / len(freqs)).astype(np.float32)

    @pytest.mark.parametrize("orig_sr,target_sr", [
        (48000, 16000), (16000, 48000), (22050, 16000), (8000, 16000)])
    def test_resample_matches_analytic_ground_truth(self, orig_sr, target_sr):
        from sgmse_tpu.data.wav import resample
        freqs = (440.0, 1333.0, 3010.5)  # < Nyquist of every rate involved
        x = self._bandlimited(orig_sr, freqs=freqs)
        y = resample(x, orig_sr, target_sr)
        n_out = int(round(len(x) * target_sr / orig_sr))
        assert abs(len(y) - n_out) <= 1
        t = np.arange(len(y)) / target_sr
        ref = sum(np.sin(2 * np.pi * f * t + 0.1 * i)
                  for i, f in enumerate(freqs)) / len(freqs)
        # Exclude filter edge transients; zero group delay in the interior.
        edge = int(0.01 * target_sr)
        err = np.max(np.abs(y[edge:-edge] - ref[edge:-edge]))
        assert err < 2e-3, f"interior resample error {err}"

    def test_resample_identity_and_roundtrip(self):
        from sgmse_tpu.data.wav import resample
        x = self._bandlimited(16000)
        assert resample(x, 16000, 16000) is x
        rt = resample(resample(x, 16000, 48000), 48000, 16000)
        edge = 160
        assert np.max(np.abs(rt[edge:-edge] - x[edge:len(rt) - edge])) < 2e-3
