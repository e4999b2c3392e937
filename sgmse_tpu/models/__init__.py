"""Score-network backbones.

Importing this package registers all backbones with the BackboneRegistry
(parity with /root/reference/sgmse/backbones/__init__.py:1-7).
"""
from .registry import BackboneRegistry
from .ncsnpp import NCSNpp, NCSNpp_48k, NCSNpp_v2, NCSNppBase

__all__ = ["BackboneRegistry", "NCSNpp", "NCSNpp_v2", "NCSNpp_48k", "NCSNppBase"]
from .dcunet import DCUNet  # noqa: E402,F401  (registers 'dcunet')
__all__.append("DCUNet")
