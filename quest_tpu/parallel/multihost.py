"""Multi-host launch — `jax.distributed` lifecycle + host-sharded IO.

New component vs the reference (single process, single GPU — SURVEY.md
§2.4). On a TPU pod slice every host runs this same program; JAX
discovers the slice topology from the TPU runtime, so
``initialize_cluster()`` usually needs no arguments. The global mesh
then spans all hosts: tensor-parallel axes ride ICI within a slice,
data-parallel request sharding rides DCN across slices (standard
"How to Scale Your Model" recipe).

Helpers here cover the host-local <-> global array plumbing that a
serving engine needs: forming a global batch from per-host requests and
reading back the logits a host owns.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quest_tpu.parallel.mesh import DP_AXIS, TP_AXIS


def initialize_cluster(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` with TPU auto-detection.

    On Cloud TPU the arguments are discovered from the metadata server /
    TPU runtime; pass them explicitly only for manual (e.g. CPU-pod)
    bring-up. MUST be the first JAX call of the process — anything that
    touches devices (including ``jax.process_count()``) initializes the
    XLA backend and makes cluster formation impossible. Idempotent for
    repeat calls; a plain single-process run (no cluster info to
    discover) is a no-op.
    """
    from jax._src import distributed as _distributed

    if _distributed.global_state.client is not None:
        return  # already initialized — idempotent
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except ValueError:
        # No coordinator/cluster environment to auto-detect:
        # single-process run (tests, one-chip dev) — nothing to do.
        pass
    except RuntimeError as e:
        if "backend" not in str(e).lower():
            raise
        # Backends already initialized. With explicit cluster arguments
        # this is a caller ordering bug — silently degrading to N
        # independent single-host jobs would be far worse; without
        # them, assume a single-process dev/test flow and warn.
        if coordinator_address is not None or (num_processes or 1) > 1:
            raise RuntimeError(
                "initialize_cluster() must be called before any other "
                "JAX operation (the XLA backend is already initialized)"
            ) from e
        import warnings
        warnings.warn(
            "initialize_cluster() called after the XLA backend was "
            "initialized; if this is a multi-host run, call it first")


def make_global_mesh(dp: Optional[int] = None,
                     tp: Optional[int] = None) -> Mesh:
    """Mesh over ALL devices of the cluster (every host must call this
    with the same arguments). Defaults: tp = devices per host (ICI),
    dp = number of hosts (DCN), the layout that keeps Quest's per-head
    estimate/top-k/sparse-attention shard-local and sends only
    activation-sized collectives across hosts.
    """
    n = jax.device_count()
    if tp is None:
        tp = jax.local_device_count()
    if dp is None:
        dp = n // tp
    assert dp * tp == n, (dp, tp, n)
    dev = np.asarray(jax.devices()).reshape(dp, tp)
    return Mesh(dev, axis_names=(DP_AXIS, TP_AXIS))


def global_batch(mesh: Mesh, host_tokens: np.ndarray) -> jax.Array:
    """Form a dp-sharded global [B_global, T] token array from each
    host's local [B_local, T] slab (requests are fed per-host,
    `jax.make_array_from_process_local_data`)."""
    sharding = NamedSharding(mesh, P(DP_AXIS, None))
    return jax.make_array_from_process_local_data(sharding, host_tokens)


def host_local_logits(logits: jax.Array) -> np.ndarray:
    """Gather the rows of the dp-sharded logits this host owns, in
    batch order (each dp row appears once even though it is replicated
    across the tp axis)."""
    rows = {}
    for s in logits.addressable_shards:
        start = s.index[0].start or 0
        if start not in rows:
            rows[start] = np.asarray(s.data)
    return np.concatenate([rows[k] for k in sorted(rows)], axis=0)
