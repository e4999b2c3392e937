#!/usr/bin/env python
"""Measure EXACT training MFU for the flagship 65M NCSN++ train step.

docs/PERFORMANCE.md's round-2 training-MFU figure (62%) was an *estimate*:
forward conv FLOPs from the compiled inference HLO x the textbook
backward~=2x-forward rule. This tool replaces the estimate with the same
methodology the inference roofline used — the FLOP count of the actual
compiled multi-step TRAINING program — and times it with the forced-readback
fence that docs/PERFORMANCE.md establishes as the only trustworthy sync on
the axon tunnel.

Usage:  python tools/train_mfu.py [--batch 8] [--k 10] [--reps 5]
        [--ablate none no_ema no_stft gn_bf16_stats]

Prints one JSON line per configuration:
  {"batch": B, "k": K, "ablate": A, "steps_per_s": S, "samples_per_s": ...,
   "tflop_per_step": F, "sustained_tflops": T, "mfu_pct": M}

Ablations (VERDICT r4 next #9 — attribute the 73% inference -> 62.6%
training MFU gap):
  no_ema        : EMA update replaced by identity (upper bound on what
                  fusing/removing the EMA elementwise pass could recover).
  no_stft       : the per-step on-device STFT of the raw wav batch replaced
                  by a zero spec of the same shape (prices the STFT).
  gn_bf16_stats : GroupNorm statistics computed in bf16 instead of flax's
                  f32 upcast (SGMSE_TPU_GN_STATS_BF16=1, blocks.py).
Each ablation keeps every conv/dot identical, so mfu_pct stays comparable.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def measure(batch: int, k: int, reps: int, ablate: str = "none") -> dict:
    import os

    if ablate == "gn_bf16_stats":
        os.environ["SGMSE_TPU_GN_STATS_BF16"] = "1"

    import sgmse_tpu.train as train_mod
    from sgmse_tpu.model import ScoreModel
    from sgmse_tpu.train import create_train_state, make_train_multi_step
    from sgmse_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if ablate == "no_ema":
        train_mod.ema_update = lambda ema, params, decay, num_updates: ema

    model = ScoreModel("ncsnpp", "ouve", precision="bfloat16")
    if ablate == "no_stft":
        spec = model.spec
        f, tc = spec.num_freqs, spec.num_frames
        spec.wav_to_spec = lambda w: jnp.zeros((w.shape[0], f, tc),
                                               jnp.complex64)
    state, tx = create_train_state(model, jax.random.key(0))
    multi = make_train_multi_step(model, tx, steps=k)
    jitted = jax.jit(multi, donate_argnums=(0,))

    target_len = model.spec.target_len  # (num_frames-1)*hop = 32640 @ defaults
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((k, batch, target_len)), jnp.float32) * 0.05
    ys = xs + jnp.asarray(
        rng.standard_normal((k, batch, target_len)), jnp.float32) * 0.02

    # AOT-compile so the FLOP count comes from the very executable we time.
    # cost_analysis() under-counts convs ~17x on this backend (round-2
    # roofline); parse the compiled HLO instead. The k-step scan body is
    # counted ONCE by the static parse => static total ~= FLOPs per step.
    from tools.hlo_flops import conv_dot_flops
    lowered = jitted.lower(state, xs, ys, jax.random.key(1))
    compiled = lowered.compile()
    hlo_text = compiled.as_text()
    counts = conv_dot_flops(hlo_text)
    assert counts["skipped"] == 0, (
        f"HLO FLOP parse skipped {counts['skipped']} conv/dot ops — total untrustworthy")
    # The static parse counts the scan body ONCE only if XLA kept the k-step
    # lax.scan as a `while` loop. If XLA unrolled it (small k, future flag
    # changes), the static total already covers all k steps — scaling by k
    # again would inflate MFU by up to k (ADVICE r3). Detect which happened.
    scan_is_while = k == 1 or (" while(" in hlo_text)
    flops_static = float(counts["flops"])
    flops_per_step = flops_static if scan_is_while else flops_static / k
    print(f"# HLO static parse: {counts['n_conv']} convs "
          f"({counts['conv_flops']/1e12:.3f} TF) + {counts['n_dot']} dots "
          f"({counts['dot_flops']/1e12:.4f} TF) "
          f"{'per train step (scan as while-loop)' if scan_is_while else 'for all k steps (scan UNROLLED)'}",
          flush=True)
    flops = flops_per_step * k if flops_per_step else None

    # Warm-up execution (donation: thread the state through).
    state, losses = compiled(state, xs, ys, jax.random.key(2))
    _ = float(losses.mean())  # forced-readback fence

    walls = []
    for i in range(reps):
        t0 = time.perf_counter()  # monotonic (ADVICE r3)
        state, losses = compiled(state, xs, ys, jax.random.key(3 + i))
        _ = float(losses.mean())
        walls.append(time.perf_counter() - t0)
    wall = sorted(walls)[len(walls) // 2]

    out = {
        "batch": batch, "k": k, "ablate": ablate,
        "steps_per_s": round(k / wall, 3),
        "samples_per_s": round(k * batch / wall, 1),
        "wall_per_exec_s": round(wall, 4),
    }
    if flops is not None:
        tflop_per_step = flops / k / 1e12
        sustained = flops / wall / 1e12
        out.update({
            "tflop_per_step": round(tflop_per_step, 3),
            "sustained_tflops": round(sustained, 1),
            "mfu_pct": round(100.0 * sustained / V5E_BF16_PEAK_TFLOPS, 1),
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[8])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--ablate", type=str, default="none",
                    choices=("none", "no_ema", "no_stft", "gn_bf16_stats"),
                    help="Run ONE ablation per process (monkeypatches at "
                         "import time; a fresh process per mode keeps the "
                         "measurements independent).")
    args = ap.parse_args()
    for b in args.batch:
        print(json.dumps(measure(b, args.k, args.reps, args.ablate)),
              flush=True)


if __name__ == "__main__":
    main()
