#!/usr/bin/env python
"""Metrics CLI: PESQ / ESTOI / SI-SDR(-SIR/-SAR) over enhanced files.

Capability parity with /root/reference/calc_metrics.py:15-67: same flags, the
VoiceBank `p232_001_0dB.wav -> p232_001.wav` filename convention (lines 30-33),
the same metric set, the same `_results.csv` + `_avg_results.txt` outputs and
the same printed mean±std report. PESQ uses the conformance `pesq` package
when installed and otherwise falls back to the built-in P.862-structured
scorer (sgmse_tpu/utils/p862.py, rank-faithful but not
conformance-certified — a one-time warning says which is active); the
NaN-robust mean_std matches the reference util, other.py:109-113.
"""
import argparse
import sys
from glob import glob
from os.path import join
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clean_dir", type=str, required=True,
                        help="Directory containing the clean data")
    parser.add_argument("--noisy_dir", type=str, required=True,
                        help="Directory containing the noisy data")
    parser.add_argument("--enhanced_dir", type=str, required=True,
                        help="Directory containing the enhanced data")
    args = parser.parse_args()

    from sgmse_tpu.data.wav import read_wav, resample
    from sgmse_tpu.utils.metrics import (energy_ratios, mean_std, pesq_impl,
                                         pesq_wb, stoi)

    data = {"filename": [], "pesq": [], "estoi": [], "si_sdr": [], "si_sir": [],
            "si_sar": []}

    noisy_files = []
    noisy_files += sorted(glob(join(args.noisy_dir, "*.wav")))
    noisy_files += sorted(glob(join(args.noisy_dir, "**", "*.wav")))

    for noisy_file in noisy_files:
        filename = noisy_file.replace(args.noisy_dir, "")[1:]
        # VoiceBank convention: p232_001_0dB.wav -> clean p232_001.wav
        if "dB" in filename:
            clean_filename = filename.split("_")[0] + ".wav"
        else:
            clean_filename = filename
        x, sr_x = read_wav(join(args.clean_dir, clean_filename))
        y, sr_y = read_wav(join(args.noisy_dir, filename))
        x_hat, sr_x_hat = read_wav(join(args.enhanced_dir, filename))
        assert sr_x == sr_y == sr_x_hat
        x, y, x_hat = x[0].astype(np.float64), y[0].astype(np.float64), x_hat[0].astype(np.float64)
        n = y - x
        x_hat_16k = resample(x_hat, sr_x_hat, 16000) if sr_x_hat != 16000 else x_hat
        x_16k = resample(x, sr_x, 16000) if sr_x != 16000 else x
        data["filename"].append(filename)
        data["pesq"].append(pesq_wb(16000, x_16k, x_hat_16k, "wb"))
        data["estoi"].append(stoi(x, x_hat, sr_x, extended=True))
        si_sdr_, si_sir, si_sar = energy_ratios(x_hat, x, n)
        data["si_sdr"].append(si_sdr_)
        data["si_sir"].append(si_sir)
        data["si_sar"].append(si_sar)

    # Provenance: when the builtin (non-conformance) scorer produced the pesq
    # column, say so IN the artifacts — archived CSVs must never be compared
    # against published conformance PESQ numbers without knowing the scorer.
    impl = pesq_impl()
    if impl != "pesq-conformance":
        data["pesq_impl"] = [impl] * len(data["filename"])

    df = pd.DataFrame(data)

    print("PESQ: {:.2f} ± {:.2f}".format(*mean_std(df["pesq"].to_numpy())))
    print("ESTOI: {:.2f} ± {:.2f}".format(*mean_std(df["estoi"].to_numpy())))
    print("SI-SDR: {:.1f} ± {:.1f}".format(*mean_std(df["si_sdr"].to_numpy())))
    print("SI-SIR: {:.1f} ± {:.1f}".format(*mean_std(df["si_sir"].to_numpy())))
    print("SI-SAR: {:.1f} ± {:.1f}".format(*mean_std(df["si_sar"].to_numpy())))

    with open(join(args.enhanced_dir, "_avg_results.txt"), "w") as log:
        log.write("PESQ: {:.2f} ± {:.2f}".format(*mean_std(df["pesq"].to_numpy())) + "\n")
        log.write("ESTOI: {:.2f} ± {:.2f}".format(*mean_std(df["estoi"].to_numpy())) + "\n")
        log.write("SI-SDR: {:.1f} ± {:.2f}".format(*mean_std(df["si_sdr"].to_numpy())) + "\n")
        log.write("SI-SIR: {:.1f} ± {:.1f}".format(*mean_std(df["si_sir"].to_numpy())) + "\n")
        log.write("SI-SAR: {:.1f} ± {:.1f}".format(*mean_std(df["si_sar"].to_numpy())) + "\n")
        if impl != "pesq-conformance":
            log.write(f"# pesq scored by {impl} (rank-faithful, NOT "
                      "ITU-conformance-certified; install `pesq` for certified numbers)\n")

    df.to_csv(join(args.enhanced_dir, "_results.csv"), index=False)


if __name__ == "__main__":
    main()
