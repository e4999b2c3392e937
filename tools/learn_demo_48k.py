#!/usr/bin/env python
"""Learn-then-enhance-better demonstration at 48 kHz — BASELINE config 3 with
TRAINED weights (VERDICT r4 next #4).

Mirrors the reference's 48 kHz recipe end to end: the `ncsnpp_48k` backbone
(attention-free, no progressive pyramids, output conv before sigma-scaling —
reference ncsnpp_48k.py:36-424) with the full 48 kHz DSP + SDE constants from
reference README.md:89:

    --n_fft 1534 --hop_length 384 --spec_factor 0.065
    --spec_abs_exponent 0.667 --sigma-min 0.1 --sigma-max 1.0 --theta 2.0

plus `--sr 48000`. No external data: clean speech comes from the synthetic
generator at 48 kHz. After training, the held-out test set is enhanced and
scored (PESQ is computed at 16 kHz like the reference calc_metrics.py:39-40;
ESTOI/SI-SDR at native 48 kHz), and a >20 s utterance is enhanced through the
chunked constant-memory `enhance_long` path (--chunk_seconds), the documented
long-utterance strategy at 48 kHz.

Usage:  python tools/learn_demo_48k.py [workdir] [--steps 3000]
"""
import subprocess
import sys
from argparse import ArgumentParser
from glob import glob
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SR = 48000
DSP = ["--n_fft", "1534", "--hop_length", "384", "--spec_factor", "0.065",
       "--spec_abs_exponent", "0.667"]
SDE = ["--sigma-min", "0.1", "--sigma-max", "1.0", "--theta", "2.0"]


def run(cmd, **kw):
    print("+", " ".join(map(str, cmd)), flush=True)
    subprocess.run([str(c) for c in cmd], check=True, cwd=REPO, **kw)


def score(clean_dir, deg_dir, label):
    from sgmse_tpu.data.wav import read_wav, resample
    from sgmse_tpu.utils.metrics import mean_std, pesq_wb, si_sdr, stoi

    p, s, e = [], [], []
    for f in sorted(glob(str(Path(clean_dir) / "*.wav"))):
        x, sr = read_wav(f)
        y, _ = read_wav(str(Path(deg_dir) / Path(f).name))
        x, y = x[0], y[0]
        n = min(len(x), len(y))
        x, y = x[:n], y[:n]
        # PESQ at 16 kHz like the reference (calc_metrics.py:39-40);
        # ESTOI/SI-SDR at native rate.
        p.append(pesq_wb(16000, resample(x, sr, 16000), resample(y, sr, 16000)))
        s.append(si_sdr(x, y))
        e.append(stoi(x, y, sr, extended=True))
    (pm, ps), (sm, ss), (em, es) = (mean_std(np.array(v)) for v in (p, s, e))
    print(f"{label}: pesq {pm:.3f}±{ps:.3f}  si_sdr {sm:.2f}±{ss:.2f}  "
          f"estoi {em:.3f}±{es:.3f}", flush=True)
    return pm, sm, em


def main():
    ap = ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/learn_demo_48k")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--num_train", type=int, default=768)
    args = ap.parse_args()
    work = Path(args.workdir)
    ds, logs, enh = work / "ds", work / "logs", work / "enh"

    # 48 kHz corpus; 2.2 s utterances cover the (256-1)*384 = 97,920-sample
    # (2.04 s) training crop.
    if not (ds / "train" / "clean").exists():
        run([sys.executable, "preprocessing/create_synthetic_speech.py", ds,
             "--num_train", args.num_train, "--num_valid", "12",
             "--num_test", "12", "--seconds", "2.2", "--sr", SR, "--seed", "9"])

    # Small-but-real ncsnpp_48k (the full 48 kHz recipe, reduced width/depth
    # like tools/learn_demo.py's 16 kHz demo so the run fits a demo budget).
    run([sys.executable, "cli/train.py", "--base_dir", ds,
         "--backbone", "ncsnpp_48k", "--sde", "ouve", "--nolog",
         "--sr", SR, *DSP, *SDE,
         "--nf", "32", "--ch_mult", "1", "1", "2", "2", "--num_res_blocks", "1",
         "--batch_size", "8", "--num_workers", "4", "--num_eval_files", "6",
         "--steps_per_execution", "8", "--precision", "bfloat16",
         "--max_steps", str(args.steps), "--log_dir", logs,
         "--save_ckpt_interval", "0"])
    version = max((p for p in logs.iterdir() if (p / "best_pesq").exists()),
                  key=lambda p: int(p.name.rsplit("_", 1)[-1])
                  if p.name.rsplit("_", 1)[-1].isdigit() else -1)

    run([sys.executable, "cli/enhance.py",
         "--test_dir", ds / "test" / "noisy", "--enhanced_dir", enh,
         "--ckpt", version / "best_pesq", "--N", "30", "--batch_size", "4",
         "--timeit"])

    score(ds / "test" / "clean", ds / "test" / "noisy", "NOISY BASELINE (48k)")
    score(ds / "test" / "clean", enh, "ENHANCED (48k)")

    # Long-utterance path: one >20 s noisy 48 kHz utterance through the
    # chunked overlap-add enhance_long (constant memory per chunk).
    from preprocessing.create_synthetic_speech import synth_utterance
    from sgmse_tpu.data.wav import write_wav

    rng = np.random.default_rng(123)
    long_dir, long_enh = work / "long", work / "long_enh"
    (long_dir).mkdir(parents=True, exist_ok=True)
    x = synth_utterance(rng, 22.0, SR)
    noise = rng.standard_normal(len(x)).astype(np.float32)
    noise *= np.sqrt((x**2).mean() / (noise**2).mean()) * 10 ** (-5 / 20)
    y = (x + noise).astype(np.float32)
    peak = max(np.abs(y).max(), np.abs(x).max()) / 0.9
    write_wav(long_dir / "long0.wav", (y / peak).astype(np.float32), SR)
    write_wav(long_dir / "long0_clean.wav", (x / peak).astype(np.float32), SR)

    run([sys.executable, "cli/enhance.py",
         "--test_dir", long_dir, "--enhanced_dir", long_enh,
         "--ckpt", version / "best_pesq", "--N", "30",
         "--chunk_seconds", "4.0", "--timeit"])
    # score only the long utterance (the _clean copy also got "enhanced";
    # ignore it).
    from sgmse_tpu.data.wav import read_wav, resample
    from sgmse_tpu.utils.metrics import pesq_wb, si_sdr, stoi

    x, _ = read_wav(str(long_dir / "long0_clean.wav"))
    y, _ = read_wav(str(long_dir / "long0.wav"))
    xh, _ = read_wav(str(long_enh / "long0.wav"))
    x, y, xh = x[0], y[0], xh[0][: len(x[0])]
    for label, d in (("noisy", y), ("enhanced (chunked)", xh)):
        print(f"LONG 22s {label}: "
              f"pesq {pesq_wb(16000, resample(x, SR, 16000), resample(d, SR, 16000)):.3f}  "
              f"si_sdr {si_sdr(x, d):.2f}  estoi {stoi(x, d, SR, extended=True):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
