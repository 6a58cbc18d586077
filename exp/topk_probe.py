"""On-chip diagnosis of the r01->r02 top-k regression (VERDICT r2 #2).

Measures select_pages variants in isolation at the 32K (P=2048) and
128K (P=8192) pool sizes, plus the exact_fast certificate failure rate
on realistic score distributions. Usage:

    python exp/topk_probe.py [P ...]     # default: 2048 8192
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from quest_tpu.ops.topk import select_pages
    from quest_tpu.utils.benchmarking import bench_op

    Ps = [int(x) for x in sys.argv[1:]] or [2048, 8192]
    B, H, page, K = 1, 32, 16, 128
    log("backend", jax.default_backend())

    rng = np.random.default_rng(0)
    for P in Ps:
        seq = jnp.asarray([P * page], jnp.int32)
        # Realistic scores: page criticality bounds are sums of D=128
        # max(q*k) terms -> roughly gaussian with a heavy right tail.
        s_np = (rng.standard_normal((B, H, P)) * 4.0
                + rng.gamma(2.0, 2.0, (B, H, P))).astype(np.float32)
        scores = jnp.asarray(s_np)

        def fb(x, y):
            dep = (jnp.sum(y[0].astype(jnp.float32)) % 7).astype(
                jnp.float32) * 1e-6
            return x + dep

        def step(method):
            def f(x, env):
                idx, nv = select_pages(env + x, seq, page, K,
                                       method=method)
                return fb(x, (idx, nv))
            return f

        x0 = jnp.zeros((B, H, P), jnp.float32)
        for m in ("exact", "exact_fast", "approx"):
            t = bench_op(step(m), x0, iters=(8, 72), reps=3, env=scores)
            log(f"P={P} select_pages[{m}]: {t*1e6:8.1f} us")

        # approx WITHOUT the runtime cond (r01 behavior), for the cond
        # cost delta: call lax.approx_max_k directly on masked scores.
        def raw_approx(x, env):
            s = env + x
            _, idx = jax.lax.approx_max_k(s, K, recall_target=0.95)
            return fb(x, (idx, idx))

        t = bench_op(raw_approx, x0, iters=(8, 72), reps=3, env=scores)
        log(f"P={P} raw approx_max_k (no cond, no masking): "
            f"{t*1e6:8.1f} us")

        def raw_exact(x, env):
            s = env + x
            _, idx = jax.lax.top_k(s, K)
            return fb(x, (idx, idx))

        t = bench_op(raw_exact, x0, iters=(8, 72), reps=3, env=scores)
        log(f"P={P} raw lax.top_k    (no cond, no masking): "
            f"{t*1e6:8.1f} us")

        # Certificate failure rate over 64 fresh draws: how often does
        # exact_fast pay approx + full sort SERIALLY?
        @jax.jit
        def cert_fail(s):
            av, ai = jax.lax.approx_max_k(s, K, recall_target=0.95)
            thr = jnp.min(av, axis=-1, keepdims=True)
            n_ge = jnp.sum((s >= thr).astype(jnp.int32), axis=-1)
            return jnp.sum((n_ge != K).astype(jnp.int32)), n_ge.max()

        fails = rows = 0
        worst = 0
        for i in range(64):
            sd = (rng.standard_normal((B, H, P)) * 4.0
                  + rng.gamma(2.0, 2.0, (B, H, P))).astype(np.float32)
            f, w = cert_fail(jnp.asarray(sd))
            fails += int(f)
            worst = max(worst, int(w))
            rows += B * H
        log(f"P={P} certificate failures: {fails}/{rows} rows "
            f"(max n_ge={worst}, K={K})")


if __name__ == "__main__":
    main()
