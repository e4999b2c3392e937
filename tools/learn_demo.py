#!/usr/bin/env python
"""Reproduce the learn-then-enhance-better system demonstration on the TPU.

Runs the exact recipe recorded in docs/PERFORMANCE.md ("The system learns"):
synthesize the speech-denoising corpus, train a 3.4M-param NCSN++ for 3200
steps through cli/train.py, enhance the held-out test set with the best-PESQ
checkpoint through cli/enhance.py, score with cli/calc_metrics.py, and print
the enhanced-vs-noisy deltas. Round-3 measured result on one v5e chip:

    PESQ  1.087 -> 3.54   (+2.45)
    SI-SDR 5.57 -> 12.9 dB (+7.3 dB)
    ESTOI 0.272 -> 0.52   (+0.25)     RTF 0.094 at N=30, batch 8

Takes ~45 min end to end (compiles included). Usage:
    python tools/learn_demo.py [workdir]
"""
import subprocess
import sys
from glob import glob
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run(cmd, **kw):
    print("+", " ".join(map(str, cmd)), flush=True)
    subprocess.run([str(c) for c in cmd], check=True, cwd=REPO, **kw)


def main():
    work = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/learn_demo")
    ds, logs, enh = work / "ds", work / "logs", work / "enh"

    run([sys.executable, "preprocessing/create_synthetic_speech.py", ds,
         "--num_train", "1024", "--num_valid", "16", "--num_test", "16",
         "--seed", "7"])
    run([sys.executable, "cli/train.py", "--base_dir", ds,
         "--backbone", "ncsnpp", "--sde", "ouve", "--nolog",
         "--nf", "32", "--ch_mult", "1", "1", "2", "2",
         "--num_res_blocks", "1", "--batch_size", "16", "--num_workers", "4",
         "--num_eval_files", "8", "--steps_per_execution", "8",
         "--precision", "bfloat16", "--max_steps", "3200",
         "--log_dir", logs, "--save_ckpt_interval", "0"])
    # Numeric sort: lexicographic order would pick version_9 over version_10.
    version = max((p for p in logs.iterdir() if (p / "best_pesq").exists()),
                  key=lambda p: int(p.name.rsplit("_", 1)[-1])
                  if p.name.rsplit("_", 1)[-1].isdigit() else -1)
    run([sys.executable, "cli/enhance.py",
         "--test_dir", ds / "test" / "noisy", "--enhanced_dir", enh,
         "--ckpt", version / "best_pesq", "--N", "30", "--batch_size", "8",
         "--timeit"])
    run([sys.executable, "cli/calc_metrics.py",
         "--clean_dir", ds / "test" / "clean",
         "--noisy_dir", ds / "test" / "noisy", "--enhanced_dir", enh])

    # Noisy-input baseline for the deltas.
    import numpy as np

    from sgmse_tpu.data.wav import read_wav
    from sgmse_tpu.utils.metrics import mean_std, pesq_wb, si_sdr, stoi

    p, s, e = [], [], []
    for f in sorted(glob(str(ds / "test" / "clean" / "*.wav"))):
        x, _ = read_wav(f)
        y, _ = read_wav(f.replace("clean", "noisy"))
        x, y = x[0], y[0]
        p.append(pesq_wb(16000, x, y))
        s.append(si_sdr(x, y))
        e.append(stoi(x, y, 16000, extended=True))
    print("NOISY BASELINE: pesq %.3f±%.3f  si_sdr %.2f±%.2f  estoi %.3f±%.3f"
          % (*mean_std(np.array(p)), *mean_std(np.array(s)),
             *mean_std(np.array(e))))
    print(f"(enhanced metrics above, from {enh}/_avg_results.txt)")


if __name__ == "__main__":
    main()
