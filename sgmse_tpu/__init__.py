"""sgmse_tpu: TPU-native score-based generative speech enhancement framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of sp-uhh/sgmse:
complex-STFT diffusion (OUVE / Schroedinger-bridge SDEs), NCSN++/DCUNet score
networks, predictor-corrector / ODE / SB reverse samplers compiled to single
lax.scan programs, data-parallel training over device meshes, and the full
train / enhance / evaluate CLI surface.
"""
from . import dsp, sdes, sampling
from .dsp import SpecTransform
from .model import ScoreModel
from .sdes import SDERegistry
from .models import BackboneRegistry
from .sampling import CorrectorRegistry, PredictorRegistry

__version__ = "0.1.0"

__all__ = [
    "SpecTransform", "ScoreModel", "SDERegistry", "BackboneRegistry",
    "PredictorRegistry", "CorrectorRegistry", "dsp", "sdes", "sampling",
]
