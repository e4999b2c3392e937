"""Test configuration: force JAX onto the CPU backend with 8 virtual devices.

This is the JAX-native way to exercise multi-device sharding logic without a
real multi-chip TPU slice (see SURVEY.md section 4).

Note: in this environment jax is pre-imported at interpreter startup by a
sitecustomize hook that selects the 'axon' TPU platform, so env vars alone are
not enough — we must update jax.config before any backend is used.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
