#!/usr/bin/env python
"""Rank-agreement study for the from-scratch STOI/ESTOI (VERDICT r4 item 5).

`sgmse_tpu.utils.metrics.stoi` replaces the reference's `pystoi` dependency
(reference calc_metrics.py:42-46, model.py:249). It feeds validation logs and
the metrics CLI, so — like the built-in PESQ scorer studied in round 4
(tools/pesq_rank_agreement.py) — what matters operationally is that it RANKS
degradation severity correctly. This runs the SAME 9 distortion families x
levels x 3 synthetic speakers as the PESQ study and reports Spearman rank
correlation between known severity orderings and the scores, for both
extended (ESTOI) and classic STOI.

Caveat shared with the PESQ study: intelligibility metrics are intentionally
insensitive to some families at mild levels (e.g. quantization above ~6 bits
is inaudible AND unintelligibility-free), so score RANGE is reported next to
rho — a flat-range family with low rho is the metric being correctly
indifferent, not wrong.

Outputs a markdown table (pasted into docs/PARITY.md) and one JSON line.
Run: python tools/estoi_rank_agreement.py
"""
import json
import sys
from pathlib import Path

import numpy as np
from scipy.stats import spearmanr

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sgmse_tpu.utils.metrics import stoi  # noqa: E402
from tools.pesq_rank_agreement import FAMILIES, SPEAKERS, FS, speech_like  # noqa: E402


def main():
    out = {}
    for extended in (True, False):
        label = "ESTOI" if extended else "STOI"
        rows = []
        worst = 1.0
        for name, levels, fn in FAMILIES:
            rhos, score_ranges = [], []
            for seed, formants in SPEAKERS:
                x = speech_like(seed, formants)
                rng = np.random.default_rng(seed * 17 + 5)
                scores = [stoi(x, fn(x, lv, rng), FS, extended=extended)
                          for lv in levels]
                rho = spearmanr(np.arange(len(levels)), scores).statistic
                rhos.append(-rho)  # severity index up => score should go down
                score_ranges.append((min(scores), max(scores)))
            rho_min = min(rhos)
            lo = min(s[0] for s in score_ranges)
            hi = max(s[1] for s in score_ranges)
            # Only count families the metric actually discriminates: a score
            # range under 0.03 is indifference, not ranking failure.
            if hi - lo >= 0.03:
                worst = min(worst, rho_min)
            rows.append((name, len(levels) * len(SPEAKERS),
                         np.mean(rhos), rho_min, lo, hi))

        print(f"### {label}")
        print("| Distortion family | pairs | Spearman rho (mean) | rho (min) "
              "| score range |")
        print("|---|---|---|---|---|")
        for name, n, mean_r, min_r, lo, hi in rows:
            print(f"| {name} | {n} | {mean_r:.3f} | {min_r:.3f} | "
                  f"{lo:.3f} - {hi:.3f} |")
        print()
        out[label] = {"families": len(rows),
                      "worst_discriminating_rho": round(float(worst), 4)}
    print(json.dumps({**out, "speakers": len(SPEAKERS)}))


if __name__ == "__main__":
    main()
