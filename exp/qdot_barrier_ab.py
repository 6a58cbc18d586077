"""A/B: where the int8-dequant optimization_barrier sits.

qdot ties the packed weights to the activation with an
optimization_barrier so XLA cannot hoist every layer's dequantized
bf16 weights to program start (an OOM, see models/quantize.py). But
the barrier's operand today is the PER-LAYER SLICE of the stacked
int8 tensor — AOT memory analysis shows each slice materialized as an
s8 HLO temp (copy), i.e. weights move read+write+read instead of one
read: ~3x weight traffic, matching the ~6.5 ms decode-step base.

Variants timed on one stacked [L, IN, OUT] int8 tensor, x [1, IN]:
  slice_barrier    barrier((q[l], x)) then dequant+matmul  (today)
  stacked_barrier  barrier((q, x)) once, slice, dequant+matmul
  no_barrier       dequant+matmul (hoisting risk; timing reference)
  bf16             plain bf16 weights (traffic reference)

Usage: python exp/qdot_barrier_ab.py [L] [IN] [OUT]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from quest_tpu.utils.benchmarking import bench_op

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    IN = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    OUT = int(sys.argv[3]) if len(sys.argv) > 3 else 14336
    assert jax.default_backend() == "tpu"
    key = jax.random.PRNGKey(0)
    q8 = jax.random.randint(key, (L, IN, OUT), -127, 127, jnp.int8)
    s = jnp.abs(jax.random.normal(key, (L, 1, OUT), jnp.float32)) * 0.01
    wbf = (q8.astype(jnp.float32) * s).astype(jnp.bfloat16)
    x0 = jnp.ones((1, IN), jnp.float32) * 0.01

    def chain(body):
        def step(x, env):
            acc = jnp.zeros((1, OUT), jnp.float32)
            for l in range(L):
                acc = acc + body(x, env, l)
            dep = jnp.tanh(jnp.sum(jnp.square(acc))) * 1e-3
            return (x + dep).astype(x.dtype)
        return step

    def slice_barrier(x, env, l):
        q, sc = env[0][l], env[1][l]
        qb, x = jax.lax.optimization_barrier((q, x))
        w = (qb.astype(jnp.float32) * sc).astype(jnp.bfloat16)
        return (x.astype(jnp.bfloat16) @ w).astype(jnp.float32)

    def stacked_barrier(x, env, l):
        qb, x = jax.lax.optimization_barrier((env[0], x))
        w = (qb[l].astype(jnp.float32) * env[1][l]).astype(jnp.bfloat16)
        return (x.astype(jnp.bfloat16) @ w).astype(jnp.float32)

    def no_barrier(x, env, l):
        w = (env[0][l].astype(jnp.float32) * env[1][l]).astype(jnp.bfloat16)
        return (x.astype(jnp.bfloat16) @ w).astype(jnp.float32)

    def bf16(x, env, l):
        return (x.astype(jnp.bfloat16) @ env[2][l]).astype(jnp.float32)

    nbytes = {"slice_barrier": L * IN * OUT, "stacked_barrier": L * IN * OUT,
              "no_barrier": L * IN * OUT, "bf16": L * IN * OUT * 2}
    for r in range(2):
        for name, body in [("slice_barrier", slice_barrier),
                           ("stacked_barrier", stacked_barrier),
                           ("no_barrier", no_barrier), ("bf16", bf16)]:
            t = bench_op(chain(body), x0, iters=(8, 72), reps=5,
                         env=(q8, s, wbf))
            print(f"round={r} {name}: {t*1e6:8.1f} us "
                  f"({nbytes[name]/t/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
