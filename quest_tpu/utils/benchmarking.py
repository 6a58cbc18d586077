"""Reliable on-device micro-benchmarking.

The NVBench analogue (`/root/reference/kernels/src/bench/`), adapted to
this environment's reality: through the axon tunnel,
``block_until_ready`` does NOT wait for device execution (measured
"51 TB/s" memcpy), and a host fetch has ~30 ms fixed latency. So we
time a **device-side ``fori_loop`` chain** of the op (data-dependent
feedback prevents CSE/DCE) at two different trip counts and take the
slope — fixed dispatch/fetch costs cancel exactly.

Calibration: a 536 MB bf16 copy measures ~1.0-1.1 ms/iter ≈ HBM speed
of light on v5e, confirming the method.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bench_op(step_fn: Callable, x0, iters: Tuple[int, int] = (4, 36),
             reps: int = 3, env=None) -> float:
    """Seconds per iteration of ``step_fn`` (x -> x, same pytree shape).

    ``step_fn`` must make the next iteration data-depend on the previous
    result (e.g. ``q + tiny * out``) so XLA cannot hoist or elide it.

    ``env``: optional pytree of loop-invariant arrays; pass anything
    large here instead of closing over it — closures become jit
    *constants* and huge ones overflow the remote-compile request.
    With env, ``step_fn(x, env)`` is called instead of ``step_fn(x)``.
    """
    lo, hi = iters

    @jax.jit
    def chain(x, n, salt, env):
        # Salt the input: the execution tunnel memoizes identical
        # (program, args) dispatches, which would zero out the slope.
        x = jax.tree.map(
            lambda l: (l + salt.astype(jnp.float32).astype(l.dtype))
            if jnp.issubdtype(l.dtype, jnp.floating) else l, x)
        body = ((lambda i, x: step_fn(x, env)) if env is not None
                else (lambda i, x: step_fn(x)))
        return jax.lax.fori_loop(0, n, body, x)

    @jax.jit
    def probe(x):
        leaf = jax.tree.leaves(x)[0]
        return jnp.sum(leaf.ravel()[:4].astype(jnp.float32))

    counter = [0]

    def run(n) -> float:
        counter[0] += 1
        salt = jnp.float32(counter[0] * 1e-9)
        t0 = time.perf_counter()
        np.asarray(probe(chain(x0, n, salt, env)))
        return time.perf_counter() - t0

    run(lo)
    run(hi)  # warm both paths (same compile; n is dynamic)
    # INTERLEAVE lo/hi reps and take the median of paired slopes.
    # The earlier min(hi)-block minus min(lo)-block form under-read the
    # slope by ~2x whenever a transient tunnel-latency window spanned
    # the whole consecutive lo block (every lo sample inflated by the
    # same few ms -> slope collapses): two independent 32K pipeline
    # measurements came in at 80-85 us, below the 82 us HBM-peak floor
    # for the bytes moved, and re-measured at 131-183 us. Pairing each
    # lo with an adjacent-in-time hi makes a latency window hit both
    # sides of the difference; the median rejects the remaining odd
    # pairs in either direction.
    slopes = sorted((run(hi) - run(lo)) / (hi - lo) for _ in range(reps))
    return max(slopes[len(slopes) // 2], 1e-9)


def chained(op: Callable, feedback_scale: float = 1e-3):
    """Wrap ``op(x) -> y`` into a chainable step ``x -> x + scale*y``.

    CAUTION: the feedback delta must be representable in x's dtype —
    bf16 absorbs deltas < ~2^-8 of x, letting XLA's algebraic
    simplifier turn the loop body into identity and elide the whole
    chain (observed!). 1e-3 of a unit-scale reduction survives bf16.
    """

    def step(x):
        y = op(x)
        dep = jnp.tanh(jnp.sum(y.astype(jnp.float32))) * feedback_scale
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    return step
