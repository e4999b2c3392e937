#!/usr/bin/env python
"""Quality-vs-NFE sweep: how far can the sampler budget drop before quality does?

The bench headline (docs/PERFORMANCE.md) is measured at the reference's own
sampler settings (PC, N=30 or N=50), where the program is conv-compute-bound —
so wall time is NFE-linear and every NFE saved is a direct RTF win. This tool
quantifies the OTHER axis the reference never explores: enhancement quality as
a function of NFE, on a trained checkpoint with held-out files, covering

  * the PC sampler at decreasing N (reference launch settings down to N=5),
  * the on-device adaptive probability-flow ODE (data-dependent NFE).

Usage:
  python tools/quality_vs_nfe.py --ckpt <ckpt_dir> \
      --test_dir <noisy_or_reverb> --clean_dir <clean_or_anechoic> \
      [--snr 0.33] [--batch_size 4] [--workdir /tmp/qvn]

Each configuration runs the real `cli/enhance.py` (so RTF numbers are the
production path, --timeit methodology) and scores PESQ / SI-SDR / ESTOI
against the clean references in-process. Prints one markdown table.
"""
import re
import subprocess
import sys
from argparse import ArgumentParser
from glob import glob
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_enhance(ckpt, test_dir, out_dir, batch_size, extra):
    cmd = [sys.executable, "cli/enhance.py", "--test_dir", str(test_dir),
           "--enhanced_dir", str(out_dir), "--ckpt", str(ckpt),
           "--batch_size", str(batch_size), "--timeit", *map(str, extra)]
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    sys.stderr.write(proc.stderr[-2000:] if proc.returncode else "")
    proc.check_returncode()
    m = re.search(r"RTF: ([0-9.]+)", proc.stdout)
    return float(m.group(1)) if m else float("nan")


def score(clean_dir, enhanced_dir):
    from sgmse_tpu.data.wav import read_wav
    from sgmse_tpu.utils.metrics import mean_std, pesq_wb, si_sdr, stoi

    p, s, e = [], [], []
    for f in sorted(glob(str(Path(clean_dir) / "*.wav"))):
        x, sr = read_wav(f)
        xh, _ = read_wav(str(Path(enhanced_dir) / Path(f).name))
        x, xh = x[0], xh[0]
        n = min(len(x), len(xh))
        x, xh = x[:n], xh[:n]
        p.append(pesq_wb(sr, x, xh))
        s.append(si_sdr(x, xh))
        e.append(stoi(x, xh, sr, extended=True))
    return tuple(mean_std(np.array(v)) for v in (p, s, e))


def main():
    ap = ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--test_dir", required=True)
    ap.add_argument("--clean_dir", required=True)
    ap.add_argument("--snr", type=float, default=0.33,
                    help="PC corrector SNR (0.33 = reference dereverb recipe)")
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/quality_vs_nfe")
    args = ap.parse_args()
    work = Path(args.workdir)

    configs = [
        ("pc N=50 (ref dereverb)", 100, ["--N", 50, "--snr", args.snr]),
        ("pc N=30 (ref default)", 60, ["--N", 30, "--snr", args.snr]),
        ("pc N=20", 40, ["--N", 20, "--snr", args.snr]),
        ("pc N=10", 20, ["--N", 10, "--snr", args.snr]),
        ("pc N=5", 10, ["--N", 5, "--snr", args.snr]),
        # Adaptive DP5(4) probability-flow ODE: NFE is data-dependent; the
        # corrector flag is ignored on this path.
        ("ode adaptive", None, ["--sampler_type", "ode"]),
    ]

    rows = []
    for name, nfe, extra in configs:
        out = work / re.sub(r"\W+", "_", name)
        rtf = run_enhance(args.ckpt, args.test_dir, out, args.batch_size, extra)
        (pm, ps), (sm, ss), (em, es) = score(args.clean_dir, out)
        rows.append((name, nfe, rtf, pm, ps, sm, ss, em, es))
        print(f"{name}: RTF {rtf:.3f}  pesq {pm:.3f}±{ps:.3f}  "
              f"si_sdr {sm:.2f}±{ss:.2f}  estoi {em:.3f}±{es:.3f}", flush=True)

    (pm, ps), (sm, ss), (em, es) = score(args.clean_dir, args.test_dir)
    print(f"\nnoisy input: pesq {pm:.3f}±{ps:.3f}  si_sdr {sm:.2f}±{ss:.2f}  "
          f"estoi {em:.3f}±{es:.3f}\n")

    print("| sampler | NFE | RTF | PESQ | SI-SDR dB | ESTOI |")
    print("|---|---|---|---|---|---|")
    for name, nfe, rtf, pm, ps, sm, ss, em, es in rows:
        print(f"| {name} | {nfe if nfe else 'adaptive'} | {rtf:.3f} "
              f"| {pm:.2f}±{ps:.2f} | {sm:.1f}±{ss:.1f} | {em:.2f}±{es:.2f} |")


if __name__ == "__main__":
    main()
