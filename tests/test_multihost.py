"""Multi-host helper plumbing (single-process semantics on the virtual
8-device CPU mesh; the cross-process paths reduce to these)."""

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from quest_tpu.parallel import (DP_AXIS, global_batch, host_local_logits,
                                initialize_cluster, make_global_mesh)


def test_initialize_cluster_single_process_noop():
    import pytest
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        initialize_cluster()      # must not raise on single-process runs
    assert jax.process_count() == 1
    # Explicit cluster args after backend init = caller ordering bug.
    with pytest.raises(RuntimeError, match="before any other"):
        initialize_cluster(coordinator_address="127.0.0.1:1234",
                           num_processes=2, process_id=0)


def test_make_global_mesh_defaults():
    mesh = make_global_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh2 = make_global_mesh(tp=2)     # dp inferred = 8 // 2
    assert mesh2.shape == {"dp": 4, "tp": 2}


def test_global_batch_and_local_logits_roundtrip():
    mesh = make_global_mesh(dp=4, tp=2)
    toks = np.arange(4 * 6, dtype=np.int32).reshape(4, 6)
    garr = global_batch(mesh, toks)
    assert garr.shape == (4, 6)
    np.testing.assert_array_equal(np.asarray(garr), toks)

    logits = jax.device_put(
        np.arange(4 * 3, dtype=np.float32).reshape(4, 3),
        NamedSharding(mesh, P(DP_AXIS, None)))
    local = host_local_logits(logits)
    np.testing.assert_array_equal(
        local, np.arange(12, dtype=np.float32).reshape(4, 3))
