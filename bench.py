#!/usr/bin/env python
"""Benchmark: enhancement throughput (inverse RTF) at the reference's default
inference config — PC sampler, reverse_diffusion + ald, N=30, snr=0.5,
corrector_steps=1 => 60 NFE per utterance (reference enhancement.py:24-30,
sampling/__init__.py:67) — on the flagship 65M-param NCSN++ model.

Prints ONE JSON line:
  {"metric": ..., "value": V, "unit": "audio_sec_per_wall_sec", "vs_baseline": R, ...}

value: audio-seconds enhanced per wall-second with OUR pipeline: the whole
N-step reverse trajectory traced into one jitted lax.scan, utterances batched,
bfloat16 compute (float32 params) — the framework's production inference
configuration.

vs_baseline: speedup vs a reference-style driver measured on the SAME device:
batch=1 per utterance, float32 (the reference's math), and a host-driven
Python loop over the 2N predictor/corrector calls with a host sync per step —
the launch pattern of the PyTorch reference's PC loop
(sampling/__init__.py:52-68). Same model, same chip; the ratio captures the
TPU-native wins (scan + batching + fusion + mixed precision). PyTorch itself
cannot run on this TPU; the proxy was calibrated against REAL torch on CPU
(tools/calibrate_baseline.py): proxy wall = 1.16x actual torch wall at the
same 60-NFE config, so vs_baseline is a proxy-measured number with a
real-torch anchor (see BASELINE.md section (c) methodology note).

Extra keys: `value_n20` / `vs_baseline_n20_matched_quality` record the PC
N=20 point of the measured quality-vs-NFE frontier (docs/PERFORMANCE.md:
PESQ within 0.04 of the N=30 default on the trained 65M checkpoint), i.e.
the speedup at matched output quality against the reference's own shipped
default. The headline `value`/`vs_baseline` stay iso-NFE at N=30.

Methodology (round 4): BOTH sides are timed over steady-state repetitions,
with the per-rep walls recorded in the JSON — the round-3 drop to
vs_baseline 4.73 was traced to the baseline side being a single un-medianed
pass (a ~20% noise swing on the slow side moved the headline; "ours" was
9.11-9.12 in every round). Round 5 tightens the noisy side further: the
baseline runs 9 reps and is summarized by the TRIMMED median (middle 5 of 9
sorted walls — BENCH_r04 contained a 15.18 s outlier among ~5.0 s reps that
a plain median-of-5 only barely survived), and the run re-measures (up to
twice) until the trimmed spread is < 15%, recording the final spread in the
JSON so two consecutive runs are comparable at a glance. The MFU line is
recomputed each run from the conv/dot FLOPs of the currently compiled
forward HLO (tools/hlo_flops.py), not a hardcoded constant, so it cannot
silently survive a conv-emitter regression.

Batch scaling measured on one v5e chip (2.04 s utts, 60 NFE): batch 4 ->
2.42 audio_s/wall_s, batch 16 -> 9.11, batch 32 -> 9.04, batch 64 -> 8.84;
flat from 16 up because the program is conv-compute-bound at ~83% MFU
(docs/PERFORMANCE.md roofline). batch=16 is the default as the knee of that
curve. The reference-style baseline loop stays at 4 utterances per rep to
bound its runtime.

Robustness: the axon remote-compile service fails transiently (HTTP 500 /
UNIMPLEMENTED); every stage retries a few times before giving up.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _trimmed(walls, trim_frac=0.25):
    """Trimmed median: drop floor(n*trim_frac) walls from each end, return
    (median of the core, relative spread of the core, core)."""
    s = sorted(walls)
    k = int(len(s) * trim_frac)
    core = s[k:len(s) - k] if len(s) > 2 * k else s
    med = core[len(core) // 2]
    return med, (core[-1] - core[0]) / med, core


def _retry(fn, what, attempts=3, sleep_s=20):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # transient remote-compile failures
            if i == attempts - 1:
                raise
            print(f"# retry {what} after: {str(e)[:120]}", flush=True)
            time.sleep(sleep_s)


def main():
    t_main0 = time.perf_counter()
    from sgmse_tpu.model import ScoreModel
    from sgmse_tpu.sdes import crandn
    from sgmse_tpu import sampling
    from sgmse_tpu.utils.compile_cache import enable_persistent_cache

    # Compiles happen strictly before the timed regions, so the on-disk cache
    # only speeds/robustifies warmup (the remote-compile service is the flaky
    # stage) — it cannot affect the measured walls.
    enable_persistent_cache()

    sr = 16000
    batch = 16
    num_frames = 256  # 2.04 s per utterance at hop 128
    n_steps = 30
    snr = 0.5
    reps = 5

    model = ScoreModel("ncsnpp", "ouve", precision="bfloat16")
    model_f32 = ScoreModel("ncsnpp", "ouve")
    variables = model.init_params(jax.random.key(0), num_frames=num_frames)
    f = model.spec.num_freqs
    audio_sec_per_utt = (num_frames - 1) * model.spec.hop_length / sr

    # Build the noisy input inside jit: complex arrays never appear as inputs
    # of tiny eager programs (the axon backend's remote compiler is flaky on
    # those) and stay on device end to end.
    y = _retry(
        lambda: jax.jit(
            lambda k: crandn(k, (batch, 1, f, num_frames)) * 0.1
        )(jax.random.key(1)).block_until_ready(),
        "make noisy input")
    score_fn = model.score_fn(variables)

    # ---- ours: batched, one jitted scan, bf16 compute -------------------------------
    # Timing methodology: force a scalar readback per rep. On the axon tunnel
    # block_until_ready() does not reliably synchronize (docs/PERFORMANCE.md,
    # round-2 roofline section); float(mean) is the only trustworthy fence.
    program, nfe = sampling.pc_sampler_program(
        "reverse_diffusion", "ald", model.sde, score_fn,
        denoise=True, eps=model.t_eps, snr=snr, corrector_steps=1)
    fenced = jax.jit(lambda k, y: program(k, y).real.mean())
    _retry(lambda: float(fenced(jax.random.key(2), y)), "compile ours")
    ours_walls = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(fenced(jax.random.key(3 + i), y))
        ours_walls.append(time.perf_counter() - t0)
    ours_wall = sorted(ours_walls)[len(ours_walls) // 2]  # median of 5
    ours_value = batch * audio_sec_per_utt / ours_wall

    # ---- MFU, recomputed from the compiled HLO each run ------------------------------
    # One network forward (the NFE unit) at the benchmarked shape: parse the
    # exact conv/dot FLOPs from its optimized HLO (cost_analysis undercounts
    # convs ~17x on this backend — docs/PERFORMANCE.md). The 60-NFE program's
    # wall then gives sustained FLOP/s. Non-fatal: the headline metric never
    # depends on this stage.
    mfu_pct = tflop_per_nfe = None
    try:
        from tools.hlo_flops import conv_dot_flops
        def _fwd_hlo():
            t_vec = jnp.full((batch,), 0.5, jnp.float32)
            return jax.jit(score_fn).lower(y, y, t_vec).compile().as_text()
        counts = conv_dot_flops(_retry(_fwd_hlo, "compile forward for MFU"))
        if counts["skipped"]:
            raise RuntimeError(f"HLO parse skipped {counts['skipped']} ops")
        tflop_per_nfe = counts["flops"] / 1e12
        tfs = tflop_per_nfe * nfe / ours_wall
        mfu_pct = 100.0 * tfs / 197.0  # v5e bf16 peak
        print(f"# sustained {tfs:.0f} TFLOP/s -> MFU {mfu_pct:.0f}% "
              f"({tflop_per_nfe:.2f} TFLOP/NFE from compiled HLO "
              f"[{counts['n_conv']} convs, {counts['n_dot']} dots] x {nfe} NFE "
              f"/ {ours_wall:.2f}s / 197 TF/s peak)", flush=True)
    except Exception as e:
        print(f"# MFU stage failed (non-fatal): {str(e)[:120]}", flush=True)

    # ---- reference-style driver: batch=1, f32, python loop, host sync per step ------
    sde = model_f32.sde
    score_fn_f32 = model_f32.score_fn(variables)

    @jax.jit
    def corrector_step(x, y1, t, key):
        std = sde.marginal_prob(x, y1, t)[1]
        step_size = (snr * std) ** 2 * 2.0
        grad = score_fn_f32(x, y1, t)
        noise = crandn(key, x.shape)
        x_mean = x + step_size[:, None, None, None] * grad
        return x_mean + noise * jnp.sqrt(step_size * 2.0)[:, None, None, None]

    @jax.jit
    def predictor_step(x, y1, t, dt, key):
        score = score_fn_f32(x, y1, t)
        rev_f, rev_G = sde.reverse_discretize(score, x, y1, t, dt)
        z = crandn(key, x.shape)
        x_mean = x - rev_f
        return x_mean + rev_G[:, None, None, None] * z, x_mean

    @jax.jit
    def prior(key, y1):
        return sde.prior_sampling(key, y1)

    fence = jax.jit(lambda x: x.real.mean())  # trustworthy per-step sync

    timesteps = np.linspace(sde.T, model.t_eps, n_steps)

    def reference_style_enhance(y1, key):
        key, kp = jax.random.split(key)
        xt = prior(kp, y1)
        xt_mean = xt
        for i in range(n_steps):
            t = jnp.full((y1.shape[0],), timesteps[i], jnp.float32)
            dt = jnp.float32(timesteps[i] - timesteps[i + 1]) if i < n_steps - 1 \
                else jnp.float32(timesteps[-1])
            key, kc, kpred = jax.random.split(key, 3)
            xt = corrector_step(xt, y1, t, kc)
            xt, xt_mean = predictor_step(xt, y1, t, dt, kpred)
            float(fence(xt))  # host sync each step (torch-loop behavior)
        return xt_mean

    vs_baseline = None
    base_walls = []
    base_spread = None
    try:
        _retry(lambda: reference_style_enhance(y[:1], jax.random.key(10)),
               "compile reference-style")  # warmup
        n_base = min(batch, 4)
        # The baseline's per-step host sync makes it the noisy side of the
        # ratio (BENCH_r04: one 15.18 s outlier among ~5.0 s reps). 9 reps,
        # trimmed median of the middle 5; if the trimmed spread is still
        # >= 15%, measure more reps (up to 21 total) before reporting.
        for round_reps in (9, 6, 6):
            for r in range(round_reps):
                t0 = time.perf_counter()
                for b in range(n_base):
                    reference_style_enhance(
                        y[b:b + 1],
                        jax.random.key(20 + 7 * len(base_walls) + b))
                base_walls.append(time.perf_counter() - t0)
            base_wall, base_spread, core = _trimmed(base_walls)
            if base_spread < 0.15:
                break
            print(f"# baseline trimmed spread {base_spread:.1%} >= 15% over "
                  f"{len(base_walls)} reps (core {core}); measuring more",
                  flush=True)
        base_value = n_base * audio_sec_per_utt / base_wall
        vs_baseline = round(ours_value / base_value, 3)
    except Exception as e:
        print(f"# baseline stage failed terminally: {str(e)[:120]}", flush=True)

    # ---- matched-quality point: PC N=20 (40 NFE) -------------------------------------
    # The measured quality-vs-NFE frontier (docs/PERFORMANCE.md, round 5, real
    # chip, trained 65M ckpt) shows PESQ within 0.04 of the reference-default
    # N=30 at N=20, so this is the throughput at matched output quality while
    # the baseline keeps ITS shipped default. Strictly optional: skipped when
    # the run is already slow (cold compiles), and failures never touch the
    # headline, which stays iso-NFE at N=30.
    n20_value = None
    if time.perf_counter() - t_main0 < 1200:
        try:
            import dataclasses
            program20, _ = sampling.pc_sampler_program(
                "reverse_diffusion", "ald",
                dataclasses.replace(model.sde, N=20), score_fn,
                denoise=True, eps=model.t_eps, snr=snr, corrector_steps=1)
            fenced20 = jax.jit(lambda k, y: program20(k, y).real.mean())
            _retry(lambda: float(fenced20(jax.random.key(2), y)),
                   "compile ours N=20")
            walls20 = []
            for i in range(reps):
                t0 = time.perf_counter()
                float(fenced20(jax.random.key(3 + i), y))
                walls20.append(time.perf_counter() - t0)
            n20_value = (batch * audio_sec_per_utt
                         / sorted(walls20)[len(walls20) // 2])
        except Exception as e:
            print(f"# N=20 stage failed (non-fatal): {str(e)[:120]}", flush=True)
    else:
        print("# N=20 stage skipped: run already past its time budget", flush=True)

    result = {
        "metric": "enhancement_throughput_pc_n30",
        "value": round(ours_value, 3),
        "unit": "audio_sec_per_wall_sec",
        "vs_baseline": vs_baseline,
        "ours_walls_s": [round(w, 3) for w in ours_walls],
        "baseline_walls_s": [round(w, 3) for w in base_walls],
    }
    if n20_value is not None:
        result["value_n20"] = round(n20_value, 3)
        if vs_baseline is not None:
            # Baseline stays at ITS shipped default (N=30): the frontier
            # measurement showed N=20 matches N=30 quality within the
            # ±0.05 PESQ bar, so this is speedup at matched quality.
            result["vs_baseline_n20_matched_quality"] = round(
                n20_value / base_value, 3)
    if base_spread is not None:
        result["baseline_trimmed_spread_pct"] = round(100 * base_spread, 1)
    if len(ours_walls) > 1:
        om = sorted(ours_walls)
        result["ours_spread_pct"] = round(100 * (om[-1] - om[0]) / ours_wall, 1)
    if mfu_pct is not None:
        result["mfu_pct"] = round(mfu_pct, 1)
        result["tflop_per_nfe"] = round(tflop_per_nfe, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        # Last-resort retry of the whole benchmark once: remote-compile
        # flakiness must not cost the round's bench record.
        print(f"# bench retrying from scratch after: {str(e)[:120]}", flush=True)
        time.sleep(30)
        main()
