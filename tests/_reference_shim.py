"""Import the reference's EXECUTABLE ScoreModel (/root/reference/sgmse/model.py)
on CPU by stubbing its heavyweight/absent dependencies.

The reference hard-imports pytorch_lightning, torchaudio, librosa, pesq,
pystoi, torch_ema, and torch_pesq at module scope (model.py:1-19,
data_module.py:1-10). None of those touch the code paths we anchor against
(_step/_loss/forward/_c_in/_c_out/_c_skip/get_*_sampler/to_audio — pure torch
math), so minimal stubs make the real reference class importable and runnable.
This turns "parity with formulas transcribed from the reference" into "parity
with the reference's executing code".

Only for tests. Stubs raise on any call that would need the real library.
"""
import sys
import types

import torch

REFERENCE = "/root/reference"


def _unavailable(name):
    def _raise(*a, **k):
        raise RuntimeError(f"{name} stub called — not available in this environment")
    return _raise


def _install_stubs():
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def save_hyperparameters(self, *a, **k):
                pass

            def log(self, *a, **k):
                pass

        class LightningDataModule:
            def __init__(self, *a, **k):
                pass

        pl.LightningModule = LightningModule
        pl.LightningDataModule = LightningDataModule
        sys.modules["pytorch_lightning"] = pl

    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.load = _unavailable("torchaudio.load")
        sys.modules["torchaudio"] = ta

    if "librosa" not in sys.modules:
        lb = types.ModuleType("librosa")
        lb.resample = _unavailable("librosa.resample")
        sys.modules["librosa"] = lb

    if "pesq" not in sys.modules:
        pq = types.ModuleType("pesq")
        pq.pesq = _unavailable("pesq.pesq")
        sys.modules["pesq"] = pq

    if "pystoi" not in sys.modules:
        st = types.ModuleType("pystoi")
        st.stoi = _unavailable("pystoi.stoi")
        sys.modules["pystoi"] = st

    if "torch_ema" not in sys.modules:
        te = types.ModuleType("torch_ema")

        class ExponentialMovingAverage:
            """No-op EMA: enough for ScoreModel.__init__/train/eval. Weights are
            never EMA-swapped, which is exactly what the anchor tests want
            (compare the live weights on both sides)."""

            def __init__(self, params, decay):
                self.decay = decay
                self.collected_params = None

            def update(self, params):
                pass

            def store(self, params):
                pass

            def copy_to(self, params):
                pass

            def restore(self, params):
                pass

            def state_dict(self):
                return {"decay": self.decay}

            def load_state_dict(self, sd):
                pass

            def to(self, *a, **k):
                return self

        te.ExponentialMovingAverage = ExponentialMovingAverage
        sys.modules["torch_ema"] = te

    if "torch_pesq" not in sys.modules:
        tp = types.ModuleType("torch_pesq")
        tp.PesqLoss = _unavailable("torch_pesq.PesqLoss")
        sys.modules["torch_pesq"] = tp


def load_reference_model_module():
    """Return the reference's sgmse.model module (executable, CPU)."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    _install_stubs()
    import sgmse.model as ref_model  # noqa: E402
    return ref_model


def make_reference_scoremodel(backbone: str, sde: str, **kwargs):
    """Build a reference ScoreModel with the real SpecsDataModule attached.

    kwargs are the usual flat soup (nf, ch_mult, n_fft, hop_length, loss_type,
    ...). Returns the model in train mode (EMA stub never swaps weights).
    """
    ref_model = load_reference_model_module()
    from sgmse.data_module import SpecsDataModule
    kwargs.setdefault("base_dir", "")
    # The reference SDE constructors have no Python defaults — the argparse
    # declarations are the defaults (sdes.py:146-153, 237-244). Supply them
    # like train.py's dynamic CLI would.
    if sde == "ouve":
        kwargs.setdefault("theta", 1.5)
        kwargs.setdefault("sigma_min", 0.05)
        kwargs.setdefault("sigma_max", 0.5)
        kwargs.setdefault("N", 30)
    elif sde == "sbve":
        kwargs.setdefault("k", 2.6)
        kwargs.setdefault("c", 0.4)
        kwargs.setdefault("N", 50)
    model = ref_model.ScoreModel(
        backbone=backbone, sde=sde, data_module_cls=SpecsDataModule, **kwargs)
    return model
