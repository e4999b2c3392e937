"""Backbone registry (parity with /root/reference/sgmse/backbones/shared.py:10)."""
from ..utils.registry import Registry

BackboneRegistry = Registry("Backbone")
