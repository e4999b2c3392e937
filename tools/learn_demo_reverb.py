#!/usr/bin/env python
"""Learn-then-dereverb-better demonstration at the FULL 65M flagship size on
the reverb-format recipe — BASELINE config 2 coverage with TRAINED weights
(VERDICT r3 item 10).

Mirrors the reference's WSJ0-REVERB recipe end to end: a reverb-format corpus
(paired {split}/{anechoic,reverb}/ dirs, reference data_module.py:36-44),
training x=anechoic / y=reverberant, and enhancement with the reference's
recommended dereverb sampler overrides `--N 50 --snr 0.33`
(/root/reference/README.md:43). No external data: clean speech comes from the
synthetic generator (preprocessing/create_synthetic_speech.py) and
reverberation from the from-scratch image-source simulator
(sgmse_tpu/data/room.py), with T60 ~ U[0.4, 0.7] s shoebox rooms like
preprocessing/create_wsj0_reverb.py.

Usage:  python tools/learn_demo_reverb.py [workdir] [--steps 2500]
"""
import subprocess
import sys
from argparse import ArgumentParser
from glob import glob
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run(cmd, **kw):
    print("+", " ".join(map(str, cmd)), flush=True)
    subprocess.run([str(c) for c in cmd], check=True, cwd=REPO, **kw)


def synthesize(ds: Path, counts, seconds: float, seed: int):
    from preprocessing.create_synthetic_speech import synth_utterance
    from sgmse_tpu.data import room as _room
    from sgmse_tpu.data.wav import write_wav

    sr = 16000
    rng = np.random.default_rng(seed)
    for split, count in counts.items():
        rev_dir = ds / split / "reverb"
        dry_dir = ds / split / "anechoic"
        rev_dir.mkdir(parents=True, exist_ok=True)
        dry_dir.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            s = synth_utterance(rng, seconds, sr)
            # Shoebox like create_wsj0_reverb.py (T60 capped at 0.7 s so the
            # 2.2 s training crops still contain usable dry/late structure).
            t60 = rng.uniform(0.4, 0.7)
            room_dim = rng.uniform([5, 5, 2], [10, 10, 4])
            center = np.array([room_dim[0] / 2, room_dim[1] / 2, 1.5])
            source = center[:2] + rng.uniform(-0.5, 0.5, 2)
            mic = center[:2] + rng.uniform(-0.5, 0.5, 2)
            src_pos = [*source, rng.uniform(1.4, 1.9)]
            mic_pos = [*mic, rng.uniform(1.4, 1.9)]
            e_abs, max_order = _room.inverse_sabine(t60, room_dim)
            max_order = min(3, max_order)
            rev = _room.simulate(room_dim, e_abs, src_pos, mic_pos, s,
                                 fs=sr, max_order=max_order)
            dry = _room.simulate(room_dim, 0.99, src_pos, mic_pos, s,
                                 fs=sr, max_order=0)
            n = min(len(rev), len(dry))
            rev, dry = rev[:n], dry[:n]
            scale = max(np.abs(rev).max(), np.abs(dry).max()) / 0.9
            name = f"rev_{split}_{i:04d}.wav"
            write_wav(rev_dir / name, (rev / scale).astype(np.float32), sr)
            write_wav(dry_dir / name, (dry / scale).astype(np.float32), sr)
        print(f"{split}: {count} reverb pairs", flush=True)


def main():
    ap = ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/learn_demo_reverb")
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--num_train", type=int, default=768)
    args = ap.parse_args()
    work = Path(args.workdir)
    ds, logs, enh = work / "ds", work / "logs", work / "enh"

    if not (ds / "train" / "reverb").exists():
        synthesize(ds, {"train": args.num_train, "valid": 12, "test": 12},
                   seconds=2.2, seed=11)

    # FULL default 65M flagship (nf=128, 7 levels) — only the data format and
    # run-length flags differ from the reference training defaults.
    run([sys.executable, "cli/train.py", "--base_dir", ds,
         "--backbone", "ncsnpp", "--sde", "ouve", "--nolog",
         "--format", "reverb", "--batch_size", "16", "--num_workers", "4",
         "--num_eval_files", "6", "--steps_per_execution", "8",
         "--precision", "bfloat16", "--max_steps", str(args.steps),
         "--log_dir", logs, "--save_ckpt_interval", "0"])
    version = max((p for p in logs.iterdir() if (p / "best_pesq").exists()),
                  key=lambda p: int(p.name.rsplit("_", 1)[-1])
                  if p.name.rsplit("_", 1)[-1].isdigit() else -1)
    # Reference dereverb overrides: N=50, snr=0.33 (README.md:43).
    run([sys.executable, "cli/enhance.py",
         "--test_dir", ds / "test" / "reverb", "--enhanced_dir", enh,
         "--ckpt", version / "best_pesq", "--N", "50", "--snr", "0.33",
         "--batch_size", "4", "--timeit"])
    run([sys.executable, "cli/calc_metrics.py",
         "--clean_dir", ds / "test" / "anechoic",
         "--noisy_dir", ds / "test" / "reverb", "--enhanced_dir", enh])

    from sgmse_tpu.data.wav import read_wav
    from sgmse_tpu.utils.metrics import mean_std, pesq_wb, si_sdr, stoi

    p, s, e = [], [], []
    for f in sorted(glob(str(ds / "test" / "anechoic" / "*.wav"))):
        x, _ = read_wav(f)
        y, _ = read_wav(f.replace("anechoic", "reverb"))
        x, y = x[0], y[0]
        p.append(pesq_wb(16000, x, y))
        s.append(si_sdr(x, y))
        e.append(stoi(x, y, 16000, extended=True))
    print("REVERB BASELINE: pesq %.3f±%.3f  si_sdr %.2f±%.2f  estoi %.3f±%.3f"
          % (*mean_std(np.array(p)), *mean_std(np.array(s)),
             *mean_std(np.array(e))))
    print(f"(enhanced metrics above, from {enh}/_avg_results.txt)")


if __name__ == "__main__":
    main()
