"""End-to-end test of the metrics CLI (filename conventions + output files)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from sgmse_tpu.data.wav import write_wav

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def metric_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("metrics")
    clean, noisy, enhanced = base / "clean", base / "noisy", base / "enhanced"
    for d in (clean, noisy, enhanced):
        d.mkdir()
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    for i in range(2):
        x = (0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        n = 0.1 * rng.standard_normal(16000).astype(np.float32)
        # dB-suffix convention (reference calc_metrics.py:30-33): the clean
        # file name is everything before the first underscore.
        write_wav(clean / f"u44{i}c020.wav", x, 16000)
        write_wav(noisy / f"u44{i}c020_5dB.wav", x + n, 16000)
        write_wav(enhanced / f"u44{i}c020_5dB.wav", x + 0.3 * n, 16000)
    return clean, noisy, enhanced


def test_calc_metrics_cli(metric_dirs):
    clean, noisy, enhanced = metric_dirs
    res = subprocess.run(
        [sys.executable, str(REPO / "cli" / "calc_metrics.py"),
         "--clean_dir", str(clean), "--noisy_dir", str(noisy),
         "--enhanced_dir", str(enhanced)],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr
    assert "SI-SDR:" in res.stdout and "ESTOI:" in res.stdout

    df = pd.read_csv(enhanced / "_results.csv")
    assert list(df["filename"]) == ["u440c020_5dB.wav", "u441c020_5dB.wav"]
    # Enhanced = clean + 0.3*noise => SI-SDR ~ +10.5 dB over the noisy input.
    assert (df["si_sdr"] > 10).all()
    # ESTOI of a pure tone is degenerate (speech-band correlations); just
    # check it is computed and in range.
    assert df["estoi"].between(-1.0, 1.0).all()
    assert (enhanced / "_avg_results.txt").exists()
