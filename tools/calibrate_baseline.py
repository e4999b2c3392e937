#!/usr/bin/env python
"""Calibrate bench.py's reference-style-driver proxy against REAL PyTorch.

bench.py reports `vs_baseline` as ours vs a reference-STYLE driver (batch=1,
f32, Python loop, host sync per step) running on the same TPU, because the
PyTorch reference cannot execute on this TPU at all. This script validates
that proxy on hardware where both sides CAN run — CPU — by timing, with the
same converted tiny model and identical sampler settings (N=30, snr=0.5,
corrector_steps=1 => 60 NFE):

  a) the ACTUAL reference hot loop: /root/reference sgmse.sampling
     get_pc_sampler over the torch NCSNpp (reference sampling/__init__.py:52-68),
  b) our proxy: the same launch pattern re-created in JAX (bench.py:105-146),
  c) ours: the jitted lax.scan PC program (production path, f32 for fairness).

If (b) is a fair stand-in for (a), wall(b) ~= wall(a) up to framework eager
overhead, and the TPU `vs_baseline` number can be read as "vs the PyTorch
launch pattern". Results are recorded in BASELINE.md section (c) and
docs/PERFORMANCE.md.

Run: python tools/calibrate_baseline.py  (CPU-only, ~3 min)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import torch

CFG = dict(nf=32, ch_mult=(1, 1, 2), num_res_blocks=1, attn_resolutions=(16,),
           image_size=256)
N_STEPS = 30
SNR = 0.5
BATCH, F, T = 1, 256, 256  # one default-config utterance (2.04 s at hop 128)
REPS = 3


def time_torch_reference():
    from sgmse.backbones.ncsnpp import NCSNpp as TorchNCSNpp
    from sgmse.sdes import OUVESDE as TorchOUVE
    from sgmse.sampling import get_pc_sampler as torch_get_pc_sampler

    torch.manual_seed(0)
    m = TorchNCSNpp(**CFG)
    m.eval()
    sde = TorchOUVE(theta=1.5, sigma_min=0.05, sigma_max=0.5, N=N_STEPS)
    score_fn = lambda x, y, t: -m(torch.cat([x, y], dim=1), t)

    g = torch.Generator().manual_seed(1)
    y = (torch.randn(BATCH, 1, F, T, generator=g)
         + 1j * torch.randn(BATCH, 1, F, T, generator=g)) * 0.1
    y = y.to(torch.complex64)
    sampler = torch_get_pc_sampler("reverse_diffusion", "ald", sde, score_fn,
                                   y, denoise=True, eps=3e-2, snr=SNR,
                                   corrector_steps=1)
    sampler()  # warmup (torch has no compile here, but first-call allocs)
    walls = []
    for _ in range(REPS):
        t0 = time.time()
        _, nfe = sampler()
        walls.append(time.time() - t0)
    return float(np.median(walls)), int(nfe), m


def build_ours(torch_model):
    from sgmse_tpu import convert, sampling
    from sgmse_tpu.model import ScoreModel

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = convert.convert_ncsnpp_state_dict(sd, **CFG)
    model = ScoreModel("ncsnpp", "ouve", N=N_STEPS, **CFG)
    return model, {"params": params}


def time_ours_scan(model, variables):
    from sgmse_tpu import sampling
    from sgmse_tpu.sdes import crandn

    score_fn = model.score_fn(variables)
    y = jax.jit(lambda k: crandn(k, (BATCH, 1, F, T)) * 0.1)(jax.random.key(1))
    program, nfe = sampling.pc_sampler_program(
        "reverse_diffusion", "ald", model.sde, score_fn,
        denoise=True, eps=model.t_eps, snr=SNR, corrector_steps=1)
    fenced = jax.jit(lambda k, y: program(k, y).real.mean())
    float(fenced(jax.random.key(2), y))  # compile
    walls = []
    for i in range(REPS):
        t0 = time.time()
        float(fenced(jax.random.key(3 + i), y))
        walls.append(time.time() - t0)
    return float(np.median(walls)), nfe


def time_proxy(model, variables):
    """bench.py's reference-style driver: eager-style per-step jit calls with a
    host sync each step (the torch launch pattern), f32."""
    from sgmse_tpu.sdes import crandn

    sde = model.sde
    score_fn = model.score_fn(variables)

    @jax.jit
    def corrector_step(x, y1, t, key):
        std = sde.marginal_prob(x, y1, t)[1]
        step_size = (SNR * std) ** 2 * 2.0
        grad = score_fn(x, y1, t)
        noise = crandn(key, x.shape)
        x_mean = x + step_size[:, None, None, None] * grad
        return x_mean + noise * jnp.sqrt(step_size * 2.0)[:, None, None, None]

    @jax.jit
    def predictor_step(x, y1, t, dt, key):
        score = score_fn(x, y1, t)
        rev_f, rev_G = sde.reverse_discretize(score, x, y1, t, dt)
        z = crandn(key, x.shape)
        x_mean = x - rev_f
        return x_mean + rev_G[:, None, None, None] * z, x_mean

    prior = jax.jit(lambda k, y1: sde.prior_sampling(k, y1))
    fence = jax.jit(lambda x: x.real.mean())
    y = jax.jit(lambda k: crandn(k, (BATCH, 1, F, T)) * 0.1)(jax.random.key(1))
    timesteps = np.linspace(sde.T, model.t_eps, N_STEPS)

    def run(key):
        key, kp = jax.random.split(key)
        xt = prior(kp, y)
        xt_mean = xt
        for i in range(N_STEPS):
            t = jnp.full((BATCH,), timesteps[i], jnp.float32)
            dt = jnp.float32(timesteps[i] - timesteps[i + 1]) if i < N_STEPS - 1 \
                else jnp.float32(timesteps[-1])
            key, kc, kpred = jax.random.split(key, 3)
            xt = corrector_step(xt, y, t, kc)
            xt, xt_mean = predictor_step(xt, y, t, dt, kpred)
            float(fence(xt))
        return xt_mean

    run(jax.random.key(10))  # compile both step programs
    walls = []
    for i in range(REPS):
        t0 = time.time()
        run(jax.random.key(20 + i))
        walls.append(time.time() - t0)
    return float(np.median(walls))


def main():
    torch.set_num_threads(max(1, torch.get_num_threads()))
    torch_wall, torch_nfe, torch_model = time_torch_reference()
    model, variables = build_ours(torch_model)
    ours_wall, ours_nfe = time_ours_scan(model, variables)
    proxy_wall = time_proxy(model, variables)
    assert torch_nfe == ours_nfe == 60, (torch_nfe, ours_nfe)

    print(f"torch reference PC loop (CPU): {torch_wall:.2f}s / utt")
    print(f"proxy reference-style driver (JAX CPU): {proxy_wall:.2f}s / utt")
    print(f"ours jitted scan (JAX CPU, f32): {ours_wall:.2f}s / utt")
    print(f"proxy/torch wall ratio: {proxy_wall / torch_wall:.3f} "
          f"(1.0 = proxy exactly reproduces the torch cost)")
    print(f"ours vs torch: {torch_wall / ours_wall:.2f}x")
    print(f"ours vs proxy: {proxy_wall / ours_wall:.2f}x")


if __name__ == "__main__":
    main()
