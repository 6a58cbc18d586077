"""Headline benchmark: Quest sparse self-attention vs dense paged decode.

Mirrors the reference's headline protocol (`BASELINE.md`: up to 7.03x
self-attention speedup vs FlashInfer dense at 32K ctx / 2048 token
budget / page 16 / 32 heads / fp16 on RTX 4090;
`/root/reference/kernels/src/bench/bench_batch_decode.cu:135-142`).

Measures, on one real TPU chip with bf16 KV cache:
  dense  = dense paged flash-decode over the full 32K cache
  sparse = estimate -> top-k -> sparse paged flash-decode (full Quest
           decode-attention pipeline, jitted as one function)
and reports speedup = t_dense / t_sparse.

Process structure: the parent never touches JAX. Each measurement
stage runs in its OWN child process under its own wall-clock cap
(``python bench.py --stage NAME``), so a Mosaic hang or compile
blow-up in one stage (the fused megakernel is the risk point — a
killed Pallas launch can wedge the remote TPU worker for ~30 min)
costs that stage only; the driver still records the rest. Stages
print one JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

T0 = time.time()


def log(*a):
    print(f"[bench {time.time()-T0:6.1f}s]", *a, file=sys.stderr,
          flush=True)


# --------------------------------------------------------------------
# Child: one measurement stage
# --------------------------------------------------------------------

def run_stage(stage: str, ctx: int):
    import numpy as np
    import jax

    # Persistent compile cache: compiles through the remote-compile
    # tunnel run minutes-long; the cache amortizes them across the
    # stage child processes (and across driver reruns).
    cache_dir = os.environ.get("QUEST_JAX_CACHE",
                               "/tmp/quest_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          0)
    except Exception as e:  # noqa: BLE001
        log(f"compile cache unavailable: {e}")
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import LayerKV, append_prefill, init_cache
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.estimate import page_scores
    from quest_tpu.ops.fused_decode import fused_sparse_decode
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages
    from quest_tpu.utils.benchmarking import bench_op

    on_tpu = jax.default_backend() == "tpu"
    log(f"stage={stage} ctx={ctx} backend={jax.default_backend()}")

    B, Hq, Hkv, D, page = 1, 32, 32, 128, 16
    BUDGET = 2048 if on_tpu else 256
    model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    quest = QuestConfig(page_size=page, token_budget=BUDGET,
                        max_seq_len=ctx)
    S = quest.page_budget
    sm = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)
    iters, reps = ((8, 72), 5) if on_tpu else ((2, 6), 2)

    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    layer = cache.layer(0)
    # Fill in chunks: a single bulk append's page-window RMW spans
    # the whole pool at 128K and OOMs alongside the staging arrays.
    # KV data is generated ON DEVICE — host->device transfer through
    # the tunnel relay runs at ~10 MB/s, so staging ~1 GB from numpy
    # (as round 1 did) dominates the whole stage's wall clock.
    CH = min(8192, ctx)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(layer, key, off):
        k1, k2 = jax.random.split(key)
        k_new = jax.random.normal(k1, (B, CH, Hkv, D), jnp.float32) * 0.3
        v_new = jax.random.normal(k2, (B, CH, Hkv, D), jnp.float32) * 0.3
        layer = append_prefill(layer, k_new, v_new)
        return LayerKV(layer.kv_pages, layer.k_max, layer.k_min,
                       jnp.asarray([0], jnp.int32) + off + CH)

    key = jax.random.PRNGKey(0)
    for off in range(0, ctx, CH):
        key, sub = jax.random.split(key)
        layer = fill(layer, sub, jnp.int32(off))
        np.asarray(layer.seq_lens)  # forced fetch: chunk really done
        log(f"fill @{off + CH}")
    log("cache filled")
    seq = jnp.asarray([ctx], jnp.int32)
    q = jnp.asarray(
        (rng.standard_normal((B, Hq, D)) * 0.3).astype(np.float32))

    # Slope-timed on device (utils/benchmarking.py): a fori_loop chain
    # with data-dependent feedback at two trip counts; fixed dispatch /
    # fetch costs cancel exactly. Big arrays ride `env`, not closures.
    def fb(x, y):
        dep = jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    f8 = jnp.float8_e4m3fn
    out = {}

    def sparse_env(meta_dtype=None):
        km, kn = layer.k_max, layer.k_min
        if meta_dtype is not None:
            km, kn = km.astype(meta_dtype), kn.astype(meta_dtype)
        return (layer.kv_pages, km, kn)

    def make_sparse_step(method):
        def sparse_step(q, env):
            kv_pages, kmax, kmin = env
            scores = page_scores(q, kmax, kmin)
            idx, num_valid = select_pages(scores, seq, page, S,
                                          method=method)
            return fb(q, sparse_decode_attention(q, kv_pages, idx,
                                                 num_valid, seq,
                                                 sm_scale=sm))
        return sparse_step

    def fused_step(q, env):
        kv_pages, kmax, kmin = env
        return fb(q, fused_sparse_decode(
            q, kv_pages, kmax, kmin, seq, sm_scale=sm, budget_pages=S,
            select_group=quest.fused_select_group,
            block_p=quest.fused_block_p,
            gather_slots=quest.fused_gather_slots))

    if stage == "dense":
        t = bench_op(
            lambda q, env: fb(q, dense_decode_attention(q, env, seq,
                                                        sm_scale=sm)),
            q, iters=iters, reps=reps, env=layer.kv_pages)
        out["dense_us"] = t * 1e6

    elif stage == "unfused":
        # Exact pipeline (estimate + select_pages + sparse decode as
        # separate calls). "exact_fast" is verified-exact: approx_max_k
        # + an exactness certificate with a lax.cond fallback to the
        # full sort — same selected set as lax.top_k (ops/topk.py).
        t = bench_op(make_sparse_step("exact_fast"), q, iters=iters,
                     reps=reps, env=sparse_env())
        out["unfused_us"] = t * 1e6

    elif stage == "unfused_serving":
        # Serving config: fp8 e4m3 metadata (halves the estimate's
        # HBM traffic) + the fastest sound selection for the pool
        # size — verified-exact approx_max_k where its certificate is
        # reliable (P <= 16*S, i.e. 32K), approx+per-row-repair beyond
        # (128K), mirroring ops/topk.py's static rule. Measured at 32K
        # (exp/serving_probe.py): exact_fast+fp8 132 us vs approx+fp8
        # 151 us — the exact path is both sounder AND faster there.
        method = ("exact_fast" if (ctx // page) <= 16 * S else "approx")
        t = bench_op(make_sparse_step(method), q, iters=iters,
                     reps=reps, env=sparse_env(f8))
        out["serving_fp8_us"] = t * 1e6

    elif stage == "fused":
        # The fused decode megakernel (ops/fused_decode.py): estimate
        # -> EXACT in-kernel top-k -> gather -> flash decode in one
        # Pallas call, bf16 metadata. Same semantics as the unfused
        # exact pipeline (tests/test_fused_decode.py).
        log("fused: first compile+run...")
        r = jax.jit(fused_step)(q, sparse_env())
        np.asarray(r)  # host fetch: block_until_ready does not wait
        log("fused: first call ok; timing")
        t = bench_op(fused_step, q, iters=iters, reps=reps,
                     env=sparse_env())
        out["fused_us"] = t * 1e6

    elif stage == "fused_fp8":
        log("fused_fp8: first compile+run...")
        r = jax.jit(fused_step)(q, sparse_env(f8))
        np.asarray(r)  # host fetch: block_until_ready does not wait
        log("fused_fp8: first call ok; timing")
        t = bench_op(fused_step, q, iters=iters, reps=reps,
                     env=sparse_env(f8))
        out["fused_fp8_us"] = t * 1e6

    else:
        raise SystemExit(f"unknown stage {stage}")

    if stage != "dense":
        # A/B the dense baseline INSIDE this process, on this process's
        # cache: speedups computed from one process's pair are immune to
        # the ±25% run-to-run variance of the remote-dispatch tunnel
        # (measured r3: the same 131 us pipeline read 159 us in another
        # process — a 4.26x-vs-5.55x swing in the recorded headline).
        log(f"{stage}: timing in-process dense baseline")
        t = bench_op(
            lambda q, env: fb(q, dense_decode_attention(q, env, seq,
                                                        sm_scale=sm)),
            q, iters=iters, reps=reps, env=layer.kv_pages)
        out["dense_us"] = t * 1e6

    # Also log the result to stderr: children's stdout rides a pipe the
    # parent may not live to read (outer wall-clock kills), while stderr
    # appends straight to the session log — per-stage numbers survive.
    log(f"result {json.dumps(out)}")
    return out


# --------------------------------------------------------------------
# Parent: orchestrate stages, each in its own process + timeout
# --------------------------------------------------------------------

def stage_cap(name: str) -> int:
    # Wall caps per child (fill + compile + slope timing). The fused
    # megakernel gets the largest cap: its Mosaic compile alone has
    # been observed north of 5 min.
    return {"dense": 1200, "unfused": 1200, "unfused_serving": 1200,
            "fused": 1500, "fused_fp8": 1500}[name]


def spawn(stage: str, ctx: int):
    cmd = [sys.executable, os.path.abspath(__file__),
           "--stage", stage, "--ctx", str(ctx)]
    try:
        p = subprocess.run(cmd, stdout=subprocess.PIPE,
                           stderr=sys.stderr,
                           timeout=stage_cap(stage),
                           cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        log(f"stage {stage}@{ctx}: TIMEOUT (wedged worker needs ~30 min"
            " to recover; subsequent stages may fail)")
        return {}
    if p.returncode != 0:
        log(f"stage {stage}@{ctx}: rc={p.returncode}")
        return {}
    for line in p.stdout.decode().splitlines()[::-1]:
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return {}


def main():
    if "--stage" in sys.argv:
        i = sys.argv.index("--stage")
        stage = sys.argv[i + 1]
        ctx = int(sys.argv[sys.argv.index("--ctx") + 1])
        print(json.dumps(run_stage(stage, ctx)), flush=True)
        return

    # Probe the backend in a subprocess: the parent must never hold
    # the (single-client) axon tunnel while measurement children run.
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend(), jax.devices())"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            timeout=180)
        probe = p.stdout.decode().strip()
    except subprocess.TimeoutExpired:
        probe = ""
    on_tpu = probe.startswith("tpu")
    log(f"backend probe: {probe or 'TIMEOUT'}")

    if not on_tpu:  # CPU smoke: one in-process pass, tiny shapes
        rd = run_stage("dense", 2048)
        ru = run_stage("unfused", 2048)
        print(json.dumps({
            "metric": "self_attention_speedup_32k_budget2048",
            "value": 0.0, "unit": "x", "vs_baseline": 0.0,
            "note": "cpu smoke only",
            "dense_us": rd.get("dense_us"),
            "unfused_us": ru.get("unfused_us")}))
        return

    # Each stage child times its sparse pipeline AND the dense baseline
    # in the SAME process on the same cache; every speedup below is a
    # same-process A/B ratio (the tunnel's ±25% cross-process variance
    # cancels in the ratio but NOT across children — r2/r3 recorded a
    # 4.26x-vs-5.55x swing for an unchanged kernel before this change).
    EXACT = (("unfused", "unfused_us"), ("fused", "fused_us"))
    SERVING = (("unfused_serving", "serving_fp8_us"),
               ("fused_fp8", "fused_fp8_us"))

    def measure(ctx):
        # Known-good stages first; the megakernel (hang-risk) last, so
        # a wedged worker cannot cost the baseline numbers.
        per = {st: spawn(st, ctx)
               for st in ("unfused", "unfused_serving", "fused",
                          "fused_fp8")}

        def best(pairs):
            # (ratio, sparse_us, dense_us, stage) of the best pipeline,
            # each ratio from one process's own dense/sparse pair.
            cands = [(o["dense_us"] / o[k], o[k], o["dense_us"], st)
                     for st, k in pairs
                     for o in [per.get(st, {})]
                     if o.get(k) and o.get("dense_us")]
            return max(cands) if cands else None
        return per, best(EXACT), best(SERVING)

    CTX = 32768
    per32, ex32, sv32 = measure(CTX)
    if ex32 is None:
        raise SystemExit("no 32K exact stage produced a dense/sparse pair")
    speedup, t_sparse, t_dense, ex_stage = ex32

    # Bytes-moved accounting (NVBench analogue,
    # `bench_batch_decode.cu:82-86`).
    bpe = 2  # bf16
    BUDGET, page, Hkv, D = 2048, 16, 32, 128
    dense_bytes = 2 * Hkv * CTX * D * bpe
    sparse_bytes = (2 * Hkv * BUDGET * D * bpe            # selected pages
                    + 2 * Hkv * (CTX // page) * D * bpe)  # metadata
    log(f"dense:  {t_dense:8.1f} us  "
        f"({dense_bytes/t_dense/1e3:.0f} GB/s)")
    log(f"sparse: {t_sparse:8.1f} us  [{ex_stage}]  "
        f"({sparse_bytes/t_sparse/1e3:.0f} GB/s)")
    log(f"speedup: {speedup:.2f}x (reference headline: 7.03x)")
    if sv32:
        log(f"serving config: {sv32[1]:.1f} us ({sv32[0]:.2f}x)")

    result = {
        "metric": "self_attention_speedup_32k_budget2048",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 7.03, 3),
        "dense_us_32k": round(t_dense, 1),
        "sparse_us_32k": round(t_sparse, 1),
    }
    if sv32:
        result["speedup_32k_serving_cfg"] = round(sv32[0], 3)

    def record(per, suffix):
        # Raw per-stage numbers (auditable: which pipeline won each
        # point, and each stage's own in-process dense baseline).
        for st, o in per.items():
            for k, v in o.items():
                key = (f"dense_{st}_us" if k == "dense_us" else k)
                result[f"{key[:-3]}_us_{suffix}"] = round(v, 1)

    record(per32, "32k")

    # Long-context point (the reference's bench axes reach 131072;
    # its published headline is the 32K point above). Fused is always
    # measured here: its overlap advantage GROWS with context (the
    # metadata stream is 4x longer), so a narrow 32K loss must not
    # hide the point where fusion matters most (r2 VERDICT).
    per128, ex128, sv128 = measure(131072)
    if ex128:
        log(f"128K: dense {ex128[2]:.0f} us, sparse {ex128[1]:.0f} us "
            f"[{ex128[3]}], speedup {ex128[0]:.2f}x"
            + (f" (serving cfg {sv128[0]:.2f}x)" if sv128 else ""))
        result["speedup_128k_budget2048"] = round(ex128[0], 3)
        if sv128:
            result["speedup_128k_serving_cfg"] = round(sv128[0], 3)
        record(per128, "128k")

    print(json.dumps(result))


if __name__ == "__main__":
    main()
