#!/usr/bin/env python
"""FULL-DEFAULT-SIZE end-to-end pipeline parity vs the torch reference.

The full-size sibling of tests/test_pipeline_parity.py (same noise-injection
scheme, same torch-side reconstruction of reference enhancement.py:62-103):
the 65M default NCSN++ config, default DSP constants (n_fft 510, hop 128),
one ~2 s utterance, PC sampler with corrector 'none' at small N. Same weights
+ same injected noise sequence => the two frameworks must produce the same
waveform. Result is recorded in docs/PERFORMANCE.md (VERDICT r2 next-round
#1b); it runs on CPU in ~10-20 min (65M torch eval per step + one jitted scan
compile), too slow for the default pytest suite.

Run: python tools/pipeline_parity_fullsize.py            # OUVE + PC + NCSN++
     python tools/pipeline_parity_fullsize.py --sb       # SBVE + SB-ODE + NCSN++v2

The --sb mode covers the published SB checkpoint family at full default size
(VERDICT r3 item 2): reference get_sb_sampler ODE variant
(/root/reference/sgmse/sampling/__init__.py:195-242) through the v2
enhancement front-end (pad_mode reflection, enhancement.py:49-51) — the ODE
variant is noise-free, so same weights => same waveform with no injection.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

from sgmse_tpu import convert
from sgmse_tpu.model import ScoreModel
from sgmse_tpu.utils.metrics import si_sdr

N_FFT, HOP = 510, 128  # default DSP constants (reference data_module.py:104-119)
SPEC_FACTOR, SPEC_EXP = 0.15, 0.5
SR = 16000
N_STEPS = 4


def torch_enhance(tm, y_wav: np.ndarray, n_steps: int, seed: int = 7):
    """Reference pipeline from importable reference pieces (mirrors
    tests/test_pipeline_parity.py::_torch_enhance at the default config)."""
    from sgmse.sdes import OUVESDE
    from sgmse.sampling import get_pc_sampler

    y = torch.from_numpy(y_wav)[None]
    t_orig = y.size(1)
    norm_factor = y.abs().max()
    y = y / norm_factor

    window = torch.hann_window(N_FFT, periodic=True)
    spec = torch.stft(y, n_fft=N_FFT, hop_length=HOP, window=window,
                      center=True, return_complex=True)
    spec = spec.abs() ** SPEC_EXP * torch.exp(1j * spec.angle()) * SPEC_FACTOR
    Y = spec.unsqueeze(0)
    num_pad = (64 - Y.size(3) % 64) % 64
    Y = torch.nn.ZeroPad2d((0, num_pad, 0, 0))(Y)

    def score_fn(x, yy, t):
        with torch.no_grad():
            return -tm(torch.cat([x, yy], dim=1), t)  # model.py:307-309

    sde = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.5, N=n_steps)
    torch.manual_seed(seed)
    zs = torch.stack([torch.randn_like(Y) for _ in range(n_steps + 1)])
    torch.manual_seed(seed)
    sampler = get_pc_sampler("reverse_diffusion", "none", sde, score_fn, Y,
                             denoise=True, eps=3e-2)
    sample, _ = sampler()

    s = sample.squeeze(0) / SPEC_FACTOR
    s = s.abs() ** (1.0 / SPEC_EXP) * torch.exp(1j * s.angle())
    x_hat = torch.istft(s, n_fft=N_FFT, hop_length=HOP, window=window,
                        center=True, length=t_orig)
    return (x_hat * norm_factor).numpy()[0], zs.numpy()


def main_sb():
    """Full-default-size SB pipeline parity (SBVE + SB-ODE + ncsnpp_v2)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from _reference_shim import load_reference_model_module, make_reference_scoremodel
    load_reference_model_module()  # install dependency stubs first
    from sgmse.util.other import pad_spec

    n_steps = 4
    print("building 65M torch reference ScoreModel (ncsnpp_v2 + sbve)...",
          flush=True)
    torch.manual_seed(0)
    ref = make_reference_scoremodel("ncsnpp_v2", "sbve",
                                    loss_type="data_prediction", N=n_steps)
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.dnn.state_dict().items()}
    params = convert.convert_ncsnpp_state_dict(sd)

    rng = np.random.default_rng(3)
    t = np.arange(2 * SR) / SR
    clean = (0.4 * np.sin(2 * np.pi * 330 * t)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    noisy = clean + 0.05 * rng.standard_normal(len(t)).astype(np.float32)

    t0 = time.time()
    y = torch.from_numpy(noisy)[None]
    t_orig = y.size(1)
    norm = y.abs().max()
    with torch.no_grad():
        Y = torch.unsqueeze(ref._forward_transform(ref._stft(y / norm)), 0)
        Y = pad_spec(Y, mode="reflection")
        sampler = ref.get_sb_sampler(sde=ref.sde, y=Y, sampler_type="ode")
        sample, _ = sampler()
        x_ref = (ref.to_audio(sample.squeeze(), t_orig) * norm).numpy()
    print(f"torch SB pipeline: {time.time() - t0:.0f}s", flush=True)

    ours = ScoreModel("ncsnpp_v2", "sbve", loss_type="data_prediction",
                      N=n_steps)
    t0 = time.time()
    x_ours = ours.enhance({"params": params}, noisy, key=jax.random.key(0),
                          sampler_type="ode", pad_mode="reflection")
    print(f"ours (incl. jit compile): {time.time() - t0:.0f}s", flush=True)

    assert x_ours.shape == x_ref.shape
    scale = np.abs(x_ref).max()
    max_rel = float(np.max(np.abs(x_ours - x_ref)) / scale)
    agreement = float(si_sdr(x_ref, x_ours))
    print(f"max |delta| / peak: {max_rel:.2e}")
    print(f"waveform agreement SI-SDR(ref, ours): {agreement:.1f} dB")
    # Tolerance note: the SB-ODE first step is numerically hostile BY THE
    # REFERENCE'S OWN FORMULATION — at t=T, xt == y and sigma_bar_prev =
    # sqrt(sde.eps) = 1e-4, so weight_prev ~ +5e3 and weight_prior_mean ~
    # -5e3 cancel to O(1) in f32 (sampling/__init__.py:218-231). Both
    # frameworks round that cancellation differently: ~1e-7 per-op noise x
    # ~5e3 amplification => ~1e-3 relative is the f32 agreement FLOOR for
    # this step, not a conversion defect (measured full-size: 2.3e-3 /
    # 47.2 dB; the tiny-config test agrees to <5e-4 where activations are
    # smaller). The discretization itself is anchored exactly by
    # tests/test_reference_anchor.py (loss + SDE-variant injection).
    ok = max_rel < 1e-2 and agreement > 40.0
    print("SB PARITY:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


def main():
    from sgmse.backbones.ncsnpp import NCSNpp as TorchNCSNpp

    print("building 65M torch reference model (default config)...", flush=True)
    torch.manual_seed(0)
    tm = TorchNCSNpp()
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert.convert_ncsnpp_state_dict(sd)

    rng = np.random.default_rng(3)
    t = np.arange(2 * SR) / SR  # 2 s utterance -> 251 frames -> padded 256
    clean = (0.4 * np.sin(2 * np.pi * 330 * t)
             * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    noisy = clean + 0.05 * rng.standard_normal(len(t)).astype(np.float32)

    t0 = time.time()
    x_ref, zs = torch_enhance(tm, noisy, N_STEPS)
    print(f"torch pipeline: {time.time() - t0:.0f}s", flush=True)

    model = ScoreModel("ncsnpp", "ouve")  # full default
    t0 = time.time()
    x_ours = model.enhance({"params": params}, noisy, key=jax.random.key(0),
                           N=N_STEPS, corrector="none", prior_noise=zs,
                           pad_mode="zero_pad")
    print(f"ours (incl. jit compile): {time.time() - t0:.0f}s", flush=True)

    assert x_ours.shape == x_ref.shape
    scale = np.abs(x_ref).max()
    max_rel = float(np.max(np.abs(x_ours - x_ref)) / scale)
    agreement = float(si_sdr(x_ref, x_ours))
    print(f"max |delta| / peak: {max_rel:.2e}")
    print(f"waveform agreement SI-SDR(ref, ours): {agreement:.1f} dB")
    ok = max_rel < 5e-3 and agreement > 35.0
    print("PARITY:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if "--sb" in sys.argv:
        main_sb()
    else:
        main()
