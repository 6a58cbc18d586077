"""Test configuration: run on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (real TPU tunnel); tests override
it to CPU so they are hermetic and exercise the multi-device sharding
path via --xla_force_host_platform_device_count. Pallas kernels detect
the CPU backend and switch to interpreter mode (ops/pallas_utils.py).

QT_SWEEP_TPU=1 leaves the real TPU backend in place instead — used by
the chip session (exp/chip_session.sh) to run the randomized kernel
sweep at hardware speed with interpret=False (the reference's ~400-combo
gtest grid runs on-device too, `kernels/src/test/test_batch_decode.cu`).
"""

import os
import sys

ON_TPU = os.environ.get("QT_SWEEP_TPU") == "1"

if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8")
    if os.environ.get("PYTEST_XDIST_WORKER"):
        # Under pytest-xdist each worker's XLA CPU backend spawns a
        # host-sized Eigen thread pool; N workers x N cores thrash.
        # One compute thread per worker is fastest in aggregate.
        flags += " --xla_cpu_multi_thread_eigen=false"
        os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
        os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ["XLA_FLAGS"] = flags.strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not ON_TPU:
    # The axon plugin overrides JAX_PLATFORMS at import time; force CPU.
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()

# Persistent compile cache (VERDICT r4 #6: suite wall-time): on this
# single-core environment the suite is dominated by XLA:CPU compiles of
# the engine/model programs, which are identical across runs. First run
# populates; repeat runs (the iteration loop this exists for) skip
# them. Keyed by backend+flags, so TPU sweep runs don't collide.
_cache = os.environ.get("QT_TEST_CACHE", "/tmp/quest_test_cache")
if _cache:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — older jax without the knobs
        pass
