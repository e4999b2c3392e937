"""Native C++ batch WAV loader vs the pure-Python reference semantics."""
import numpy as np
import pytest

from sgmse_tpu.data import native
from sgmse_tpu.data.dataset import Specs, WavLoader
from sgmse_tpu.data.wav import read_wav, write_wav


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native wav loader unavailable (no C++ toolchain)")
    return lib


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    for split in ("train",):
        (base / split / "clean").mkdir(parents=True)
        (base / split / "noisy").mkdir(parents=True)
        for i, n in enumerate([4000, 2000, 900]):  # long, exact-ish, short
            x = (0.5 * np.sin(2 * np.pi * 220 * np.arange(n) / 16000)
                 ).astype(np.float32)
            y = x + 0.1 * rng.standard_normal(n).astype(np.float32)
            write_wav(base / split / "clean" / f"u{i}.wav", x, 16000)
            write_wav(base / split / "noisy" / f"u{i}.wav", y, 16000)
    return base


def test_native_read_wav_matches_python(lib, dataset_dir):
    path = str(dataset_dir / "train" / "clean" / "u0.wav")
    x_py, sr_py = read_wav(path)
    x_nat, sr_nat = native.read_wav_native(path)
    assert sr_nat == sr_py
    np.testing.assert_allclose(x_nat, x_py[0], atol=1e-6)


def test_center_crop_and_normalize_match_python(lib, dataset_dir):
    ds = Specs(str(dataset_dir), "train", dummy=False, shuffle_spec=False,
               num_frames=16, hop_length=64, normalize="noisy")
    n = len(ds.clean_files)
    res = native.load_pair_batch(ds.clean_files, ds.noisy_files, ds.target_len,
                                 random_crop=False, seed=0, normalize="noisy")
    assert res is not None
    x_nat, y_nat = res
    for i in range(n):
        x_py, y_py = ds.load_pair(i)
        np.testing.assert_allclose(x_nat[i], x_py, atol=1e-5)
        np.testing.assert_allclose(y_nat[i], y_py, atol=1e-5)


@pytest.mark.parametrize("normalize", ["clean", "not"])
def test_other_normalize_modes(lib, dataset_dir, normalize):
    ds = Specs(str(dataset_dir), "train", dummy=False, shuffle_spec=False,
               num_frames=16, hop_length=64, normalize=normalize)
    res = native.load_pair_batch(ds.clean_files, ds.noisy_files, ds.target_len,
                                 random_crop=False, seed=0, normalize=normalize)
    x_nat, y_nat = res
    for i in range(len(ds.clean_files)):
        x_py, y_py = ds.load_pair(i)
        np.testing.assert_allclose(x_nat[i], x_py, atol=1e-5)
        np.testing.assert_allclose(y_nat[i], y_py, atol=1e-5)


def test_random_crop_in_bounds_and_seeded(lib, dataset_dir):
    ds = Specs(str(dataset_dir), "train", dummy=False, shuffle_spec=True,
               num_frames=16, hop_length=64, normalize="noisy")
    a = native.load_pair_batch(ds.clean_files, ds.noisy_files, ds.target_len,
                               random_crop=True, seed=7, normalize="noisy")
    b = native.load_pair_batch(ds.clean_files, ds.noisy_files, ds.target_len,
                               random_crop=True, seed=7, normalize="noisy")
    c = native.load_pair_batch(ds.clean_files, ds.noisy_files, ds.target_len,
                               random_crop=True, seed=8, normalize="noisy")
    np.testing.assert_array_equal(a[0], b[0])  # same seed -> same crops
    assert not np.array_equal(a[0][0], c[0][0])  # long file: crop moves
    assert np.all(np.isfinite(a[0])) and np.max(np.abs(a[1])) <= 1.0 + 1e-6


def test_bad_file_raises(lib, tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav at all")
    with pytest.raises(RuntimeError, match="native wav"):
        native.load_pair_batch([str(bad)], [str(bad)], 100,
                               random_crop=False, seed=0, normalize="noisy")


def test_wavloader_uses_native_path(lib, dataset_dir):
    ds = Specs(str(dataset_dir), "train", dummy=False, shuffle_spec=False,
               num_frames=16, hop_length=64, normalize="noisy")
    loader = WavLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batches = list(loader)
    assert len(batches) == 2  # 3 files, last batch padded by repetition
    for x, y in batches:
        assert x.shape == (2, ds.target_len) and x.dtype == np.float32
        assert y.shape == (2, ds.target_len)
