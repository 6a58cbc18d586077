"""Test configuration: run on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (real TPU tunnel); tests override
it to CPU so they are hermetic and exercise the multi-device sharding
path via --xla_force_host_platform_device_count. Pallas kernels detect
the CPU backend and switch to interpreter mode (ops/pallas_utils.py).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon plugin overrides JAX_PLATFORMS at import time; force CPU here.
jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
