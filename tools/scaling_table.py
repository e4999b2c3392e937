#!/usr/bin/env python
"""Virtual-mesh SPMD scaling evidence: 1/2/4/8-device weak scaling.

Multi-chip hardware is not available here (one real TPU behind the axon
tunnel), so the scaling claim is validated the JAX-native way: the SAME jitted
data-parallel training step the Trainer uses (sgmse_tpu/train.py
make_train_step, batch over 'data', params replicated) is compiled and
executed on n-device virtual CPU meshes at fixed PER-DEVICE batch (weak
scaling), and we record for each n:

- per-device FLOPs from XLA's cost analysis — weak scaling holds iff this is
  constant in n (the collectives add only O(params) communication);
- the collective structure of the compiled HLO (all-reduce count — the
  gradient/EMA reduction XLA inserted for the replicated-out shardings);
- executed wall time per step. CAVEAT: this host has ONE physical core, so n
  virtual devices time-slice it and raw wall time necessarily grows ~n x; the
  host-core-normalized column (wall / n) is the comparable number, and the
  roofline evidence for real-chip throughput lives in docs/PERFORMANCE.md.

Each n runs in a fresh subprocess (device count is a process-level XLA flag).

Run: python tools/scaling_table.py          (~2 min)
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

CHILD_CODE = r"""
import json, os, re, time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import sys
sys.path.insert(0, os.environ["SGMSE_REPO"])
from sgmse_tpu.model import ScoreModel
from sgmse_tpu.parallel.mesh import (data_sharding, replicate, replicated,
                                     shard_batch)
from sgmse_tpu.train import create_train_state, make_train_step

n = int(os.environ["SCALING_N"])
per_device_batch = 2
devices = jax.devices()[:n]
assert len(devices) == n
mesh = Mesh(np.array(devices), ("data",))

model = ScoreModel(
    "ncsnpp", "ouve",
    nf=16, ch_mult=(1, 1, 2), num_res_blocks=1, attn_resolutions=(16,),
    image_size=64, n_fft=126, hop_length=32, num_frames=64, num_eval_files=0,
)
state, tx = create_train_state(model, jax.random.key(0))
state = replicate(mesh, state)

step = jax.jit(
    make_train_step(model, tx),
    in_shardings=(replicated(mesh), data_sharding(mesh), data_sharding(mesh),
                  replicated(mesh)),
    out_shardings=(replicated(mesh), replicated(mesh)),
)

rng = np.random.default_rng(0)
batch = per_device_batch * n  # weak scaling: fixed per-device work
L = model.spec.target_len
x = rng.standard_normal((batch, L)).astype(np.float32) * 0.1
y = x + rng.standard_normal((batch, L)).astype(np.float32) * 0.02
xd, yd = shard_batch(mesh, (x, y))

lowered = step.lower(state, xd, yd, jax.random.key(1))
compiled = lowered.compile()
cost = compiled.cost_analysis()
cost = cost[0] if isinstance(cost, (list, tuple)) else cost
flops_per_device = float(cost.get("flops", float("nan")))
hlo = compiled.as_text()
n_all_reduce = len(re.findall(r"all-reduce(?:-start)?\(", hlo)) or hlo.count("all-reduce")

state, loss = step(state, xd, yd, jax.random.key(1))  # warmup/execute
assert np.isfinite(float(loss))
walls = []
for i in range(3):
    t0 = time.time()
    state, loss = step(state, xd, yd, jax.random.key(2 + i))
    float(loss)  # fence
    walls.append(time.time() - t0)

print(json.dumps({
    "n": n, "global_batch": batch, "loss": float(loss),
    "flops_per_device": flops_per_device, "all_reduce_ops": int(n_all_reduce),
    "median_step_wall_s": sorted(walls)[1],
}))
"""


def run_one(n: int, repo: Path) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if not f.startswith("--xla_force_host_platform_device_count"))
    env["XLA_FLAGS"] = f"{flags} --xla_force_host_platform_device_count={n}".strip()
    env["SCALING_N"] = str(n)
    env["SGMSE_REPO"] = str(repo)
    proc = subprocess.run([sys.executable, "-c", CHILD_CODE], env=env,
                          capture_output=True, text=True, timeout=900)
    if proc.returncode != 0:
        raise RuntimeError(f"n={n} failed: {proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main():
    repo = Path(__file__).resolve().parent.parent
    rows = [run_one(n, repo) for n in (1, 2, 4, 8)]
    base_flops = rows[0]["flops_per_device"]
    print(f"host cores: {os.cpu_count()} (virtual devices time-slice them; "
          "wall/n is the comparable column)")
    print(f"{'devices':>8} {'global_batch':>13} {'flops/device':>14} "
          f"{'vs n=1':>7} {'all-reduce':>11} {'step wall s':>12} {'wall/n s':>9}")
    for r in rows:
        rel = r["flops_per_device"] / base_flops if base_flops else float("nan")
        print(f"{r['n']:>8} {r['global_batch']:>13} {r['flops_per_device']:>14.3e} "
              f"{rel:>7.3f} {r['all_reduce_ops']:>11} "
              f"{r['median_step_wall_s']:>12.3f} "
              f"{r['median_step_wall_s'] / r['n']:>9.3f}")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
