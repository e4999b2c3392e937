"""Reverse-converter (JAX -> torch) tests: the exporter must produce
state_dicts that (a) round-trip bit-exactly through the importer, (b) load
into the actual reference torch modules with strict=True and reproduce our
forward pass, and (c) keep torch's state_dict KEY ORDER so torch_ema
shadow_params stay positionally aligned (reference model.py:100-109).
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

from sgmse_tpu import convert
from sgmse_tpu.models import DCUNet, NCSNpp

SMALL_CFG = dict(nf=16, ch_mult=(1, 1, 2), num_res_blocks=1, attn_resolutions=(16,),
                 image_size=64)


def _rand_complex(rng, shape, scale=0.3):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64) * scale


def test_ncsnpp_roundtrip_bitexact_and_ordered():
    """torch -> ours -> torch must be bit-exact, with identical key ORDER
    (order is what torch_ema uses to associate shadow_params)."""
    from sgmse.backbones.ncsnpp import NCSNpp as TorchNCSNpp
    torch.manual_seed(0)
    m = TorchNCSNpp(**SMALL_CFG)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params = convert.convert_ncsnpp_state_dict(sd, **SMALL_CFG)
    back = convert.export_ncsnpp_state_dict(params, **SMALL_CFG)
    assert list(back.keys()) == list(sd.keys())
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_ncsnpp_full_default_roundtrip():
    """Full 65M default config: every tensor survives the round trip."""
    from sgmse.backbones.ncsnpp import NCSNpp as TorchNCSNpp
    torch.manual_seed(0)
    m = TorchNCSNpp()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    back = convert.export_ncsnpp_state_dict(convert.convert_ncsnpp_state_dict(sd))
    assert list(back.keys()) == list(sd.keys())
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_export_trainable_order_matches_named_parameters():
    """The exporter's trainable-key filter (used for EMA shadow_params) must
    enumerate exactly torch's named_parameters order."""
    from sgmse.backbones.ncsnpp import NCSNpp as TorchNCSNpp
    torch.manual_seed(0)
    m = TorchNCSNpp(**SMALL_CFG)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    back = convert.export_ncsnpp_state_dict(
        convert.convert_ncsnpp_state_dict(sd, **SMALL_CFG), **SMALL_CFG)
    ours = [f"dnn.{k}" for k in back
            if not k.endswith(("running_mean", "running_var",
                               "num_batches_tracked"))
            and not convert._is_fourier_w(f"dnn.{k}")]
    torch_order = [f"dnn.{k}" for k, p in m.named_parameters() if p.requires_grad]
    assert ours == torch_order


def test_export_loads_into_torch_with_forward_parity():
    """OUR random-init params -> exported sd -> torch strict load -> the torch
    module must reproduce our forward pass (the TPU-trained-model-goes-back
    user path)."""
    from sgmse.backbones.ncsnpp import NCSNpp as TorchNCSNpp

    rng = np.random.default_rng(3)
    b, f, tt = 2, 64, 32
    x_t = _rand_complex(rng, (b, 1, f, tt))
    y = _rand_complex(rng, (b, 1, f, tt))
    t = np.asarray([0.4, 0.8], np.float32)

    model = NCSNpp(**SMALL_CFG)
    variables = model.init(jax.random.key(7), jnp.asarray(x_t), jnp.asarray(y),
                           jnp.asarray(t))
    params = jax.tree.map(np.asarray, variables["params"])
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x_t),
                                  jnp.asarray(y), jnp.asarray(t)))

    sd = convert.export_ncsnpp_state_dict(params, **SMALL_CFG)
    torch.manual_seed(0)
    m = TorchNCSNpp(**SMALL_CFG)
    m.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()}, strict=True)
    m.eval()
    with torch.no_grad():
        torch_in = torch.from_numpy(np.concatenate([x_t, y], axis=1))
        ref = m(torch_in, torch.from_numpy(t)).numpy()

    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours.real, ref.real, atol=2e-4 * scale + 1e-5,
                               rtol=2e-3)
    np.testing.assert_allclose(ours.imag, ref.imag, atol=2e-4 * scale + 1e-5,
                               rtol=2e-3)


def test_dcunet_roundtrip_bitexact_and_ordered():
    from sgmse.backbones.dcunet import DCUNet as TorchDCUNet
    torch.manual_seed(0)
    m = TorchDCUNet()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params, stats = convert.convert_dcunet_state_dict(sd)
    back = convert.export_dcunet_state_dict(params, stats)
    assert list(back.keys()) == list(sd.keys())
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_export_derives_image_size_from_dsp(tmp_path):
    """A model trained with default image_size=256 but a 64-freq DSP config
    (n_fft=126) places attention by RUNTIME height; the exporter must describe
    it with image_size=num_freqs so the reference layout matches (regression:
    this exact mismatch made export fail on a real train-drive checkpoint)."""
    from sgmse.backbones.ncsnpp import NCSNpp as TorchNCSNpp

    from sgmse_tpu.checkpoint import save_checkpoint
    from sgmse_tpu.model import ScoreModel

    # image_size left at the 256 default; the DSP yields 64 freqs.
    model = ScoreModel("ncsnpp", "ouve", n_fft=126, hop_length=32,
                       num_frames=64, nf=16, ch_mult=(1, 1, 2),
                       num_res_blocks=1, attn_resolutions=(16,))
    variables = model.init_params(jax.random.key(0), num_freqs=64)
    params = jax.tree.map(np.asarray, variables["params"])
    assert "down_2_attn0" in params  # runtime H hit 16 at level 2
    assert model.config_dict()["image_size"] == 256
    state_tree = {"step": np.asarray(1, np.int32), "params": params,
                  "ema_params": params, "num_updates": np.asarray(1, np.int32)}
    orbax_dir = tmp_path / "orbax"
    save_checkpoint(orbax_dir, state_tree, model.config_dict())

    ckpt = convert.export_lightning_checkpoint(orbax_dir,
                                               str(tmp_path / "out.ckpt"))
    assert ckpt["hyper_parameters"]["image_size"] == 64
    # The exported layout must instantiate + strict-load in the reference.
    hp = ckpt["hyper_parameters"]
    torch.manual_seed(0)
    m = TorchNCSNpp(nf=hp["nf"], ch_mult=tuple(hp["ch_mult"]),
                    num_res_blocks=hp["num_res_blocks"],
                    attn_resolutions=tuple(hp["attn_resolutions"]),
                    image_size=hp["image_size"])
    m.load_state_dict({k[len("dnn."):]: v
                       for k, v in ckpt["state_dict"].items()}, strict=True)


def test_lightning_checkpoint_roundtrip(tmp_path):
    """Orbax ckpt (trained-on-TPU stand-in) -> export .ckpt -> re-import: the
    params and the EMA weights must survive the full cycle bit-exactly, via
    the two-way CLI (auto-detected directions)."""
    import subprocess

    from sgmse_tpu.checkpoint import load_score_model, save_checkpoint
    from sgmse_tpu.model import ScoreModel

    model = ScoreModel("ncsnpp", "ouve", n_fft=126, hop_length=32,
                       num_frames=64, **SMALL_CFG)
    variables = model.init_params(jax.random.key(0), num_freqs=64)
    params = jax.tree.map(np.asarray, variables["params"])
    # EMA = 0.5x the trainables; the GFP W projection stays identical — it is
    # stop-gradient'd here and a buffer in torch, so torch_ema never shadows
    # it (matching what real training produces).
    ema_params = jax.tree.map(lambda a: 0.5 * a, params)
    ema_params["fourier"]["W"] = params["fourier"]["W"]
    state_tree = {"step": np.asarray(1234, np.int32), "params": params,
                  "ema_params": ema_params,
                  "num_updates": np.asarray(1234, np.int32)}
    orbax_dir = tmp_path / "orbax"
    save_checkpoint(orbax_dir, state_tree, model.config_dict())

    ckpt_path = tmp_path / "exported.ckpt"
    res = subprocess.run(
        [sys.executable, "-m", "sgmse_tpu.convert", str(orbax_dir),
         str(ckpt_path)],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert res.returncode == 0, res.stderr[-2000:]

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    assert ckpt["global_step"] == 1234
    assert ckpt["hyper_parameters"]["backbone"] == "ncsnpp"
    assert ckpt["ema"]["num_updates"] == 1234
    n_trainable = len([k for k in ckpt["state_dict"]
                       if not convert._is_fourier_w(k)])
    assert len(ckpt["ema"]["shadow_params"]) == n_trainable

    back_dir = tmp_path / "reimported"
    res = subprocess.run(
        [sys.executable, "-m", "sgmse_tpu.convert", str(ckpt_path),
         str(back_dir)],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert res.returncode == 0, res.stderr[-2000:]

    model2, variables2 = load_score_model(back_dir)
    assert model2.backbone == "ncsnpp" and model2.spec.n_fft == 126
    # load_score_model returns the EMA weights; they must equal the originals.
    flat1 = jax.tree_util.tree_leaves_with_path(ema_params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(variables2["params"]))
    assert len(flat1) == len(flat2)
    for path, leaf in flat1:
        np.testing.assert_array_equal(np.asarray(flat2[path]), np.asarray(leaf),
                                      err_msg=str(path))
