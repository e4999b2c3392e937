"""bench.py helper tests (importable without touching a device)."""
import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_trimmed_median_drops_outliers():
    bench = _load_bench()
    # BENCH_r04's real failure mode: one 15.18 s outlier among ~5.0 s reps.
    walls = [5.0, 5.1, 5.0, 4.9, 5.2, 5.05, 4.95, 5.1, 15.18]
    med, spread, core = bench._trimmed(walls)
    assert len(core) == 5  # middle 5 of 9
    assert 15.18 not in core
    assert 4.9 < med < 5.2
    assert spread < 0.15

    # Small sample: no trimming, plain median.
    med3, spread3, core3 = bench._trimmed([1.0, 2.0, 3.0])
    assert med3 == 2.0 and core3 == [1.0, 2.0, 3.0]

    # A genuinely noisy core reports a large spread (the re-measure trigger).
    _, spread_noisy, _ = bench._trimmed([4.0, 5.0, 6.0, 7.0, 8.0,
                                         9.0, 10.0, 11.0, 12.0])
    assert spread_noisy > 0.15
