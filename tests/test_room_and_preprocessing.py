"""Shoebox room simulator + WSJ0-REVERB preprocessing script end-to-end."""
import subprocess
import sys
from glob import glob
from pathlib import Path

import numpy as np
import pytest

from sgmse_tpu.data import room
from sgmse_tpu.data.wav import write_wav

REPO = Path(__file__).resolve().parent.parent


def test_inverse_sabine_matches_formula():
    e_abs, max_order = room.inverse_sabine(0.5, [6.0, 5.0, 3.0])
    volume = 6.0 * 5.0 * 3.0
    surface = 2 * (6 * 5 + 5 * 3 + 6 * 3)
    expected = 24 * np.log(10) / 343.0 * volume / (surface * 0.5)
    assert abs(e_abs - expected) < 1e-9
    assert max_order >= 1


def test_rir_direct_path_and_rt60():
    room_dim = [6.0, 5.0, 3.0]
    src, mic = [2.0, 2.0, 1.5], [4.0, 3.0, 1.5]
    e_abs, _ = room.inverse_sabine(0.4, room_dim)
    rir = room.shoebox_rir(room_dim, e_abs, src, mic, fs=16000, max_order=12)
    # Direct path arrives at d/c seconds.
    d = np.linalg.norm(np.subtract(src, mic))
    i_direct = int(d / 343.0 * 16000)
    assert np.abs(rir[i_direct:i_direct + 2]).max() > 0
    assert np.abs(rir[:max(i_direct - 2, 0)]).max() == 0  # nothing before direct
    # Schroeder RT60 estimate within a loose factor of the target.
    t60 = room.measure_rt60(rir, fs=16000)
    assert 0.1 < t60 < 1.2, t60


def test_simulate_convolves():
    sig = np.zeros(1600, dtype=np.float64)
    sig[0] = 1.0  # impulse in -> RIR out
    out = room.simulate([6, 5, 3], 0.3, [2, 2, 1.5], [4, 3, 1.5], sig, fs=16000,
                        max_order=2)
    rir = room.shoebox_rir([6, 5, 3], 0.3, [2, 2, 1.5], [4, 3, 1.5], fs=16000,
                           max_order=2)
    np.testing.assert_allclose(out[: len(rir)], rir, atol=1e-12)


def test_create_wsj0_reverb_script(tmp_path):
    """Run the preprocessing CLI on a 2-file synthetic WSJ0 layout."""
    wsj0 = tmp_path / "wsj0"
    rng = np.random.default_rng(0)
    for split_dir in ("si_tr_s/401", "si_dt_05/401", "si_et_05/401"):
        d = wsj0 / split_dir
        d.mkdir(parents=True)
        for i in range(1):
            x = (0.3 * np.sin(2 * np.pi * 300 * np.arange(8000) / 16000)
                 + 0.01 * rng.standard_normal(8000)).astype(np.float32)
            write_wav(d / f"u{i}.wav", x, 16000)
    target = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, str(REPO / "preprocessing" / "create_wsj0_reverb.py"),
         "--wsj0_dir", str(wsj0), "--target_dir", str(target)],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    for split in ("train", "valid", "test"):
        rev = glob(str(target / "audio" / split / "reverb" / "*.wav"))
        dry = glob(str(target / "audio" / split / "anechoic" / "*.wav"))
        assert len(rev) == 1 and len(dry) == 1, (split, rev, dry)
        # t60 and DRR are embedded in the filename: {name}_{room}_{t60}_{drr}.wav
        stem = Path(rev[0]).stem
        parts = stem.split("_")
        assert len(parts) >= 4
        float(parts[-1]), float(parts[-2])  # parse DRR and t60
    assert glob(str(target / "audio" / "test" / "unauralized" / "*.wav"))


def test_create_wsj0_chime3_script(tmp_path):
    """Run the WSJ0+CHiME3 mixing CLI on a synthetic layout."""
    wsj0 = tmp_path / "wsj0/"
    chime = tmp_path / "chime3/"
    rng = np.random.default_rng(1)
    for split_dir in ("si_tr_s/401", "si_dt_05/401", "si_et_05/401"):
        d = wsj0 / split_dir
        d.mkdir(parents=True)
        x = (0.3 * np.sin(2 * np.pi * 250 * np.arange(8000) / 16000)).astype(np.float32)
        write_wav(d / "u0.wav", x, 16000)
    bg = chime / "data" / "backgrounds"
    bg.mkdir(parents=True)
    write_wav(bg / "noise0.CH1.wav",
              (0.1 * rng.standard_normal(32000)).astype(np.float32), 16000)
    target = tmp_path / "mix"
    res = subprocess.run(
        [sys.executable, str(REPO / "preprocessing" / "create_wsj0_chime3.py"),
         str(wsj0) + "/", str(chime) + "/", str(target) + "/"],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    for split in ("train", "valid", "test"):
        clean = glob(str(target / split / "clean" / "*.wav"))
        noisy = glob(str(target / split / "noisy" / "*.wav"))
        assert len(clean) == 1 and len(noisy) == 1, (split, clean, noisy)


def test_create_wsj0_qut_script(tmp_path):
    """Run the WSJ0+QUT mixing CLI on a synthetic layout (named noise files)."""
    wsj0 = tmp_path / "wsj0/"
    qut = tmp_path / "qut/"
    rng = np.random.default_rng(2)
    for split_dir in ("si_tr_s/401", "si_dt_05/401", "si_et_05/401"):
        d = wsj0 / split_dir
        d.mkdir(parents=True)
        x = (0.3 * np.sin(2 * np.pi * 260 * np.arange(8000) / 16000)).astype(np.float32)
        write_wav(d / "u0.wav", x, 16000)
    qd = qut / "noises"
    qd.mkdir(parents=True)
    # CAR gets 2 min trimmed from each end -> needs > 4 min of samples.
    for name, secs in (("CAFE-CAFE-1.wav", 30), ("CAR-WINDOWNB-1.wav", 260),
                       ("HOME-KITCHEN-1.wav", 30), ("STREET-CITY-1.wav", 30)):
        write_wav(qd / name,
                  (0.1 * rng.standard_normal(16000 * secs)).astype(np.float32),
                  16000)
    target = tmp_path / "mix"
    res = subprocess.run(
        [sys.executable, str(REPO / "preprocessing" / "create_wsj0_qut.py"),
         str(wsj0) + "/", str(qut) + "/", str(target) + "/"],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    for split in ("train", "valid", "test"):
        assert len(glob(str(target / split / "clean" / "*.wav"))) == 1
        assert len(glob(str(target / split / "noisy" / "*.wav"))) == 1
