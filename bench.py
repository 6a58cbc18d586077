"""Headline benchmark: Quest sparse self-attention vs dense paged decode.

Mirrors the reference's headline protocol (`BASELINE.md`: up to 7.03x
self-attention speedup vs FlashInfer dense at 32K ctx / 2048 token
budget / page 16 / 32 heads / fp16 on RTX 4090;
`/root/reference/kernels/src/bench/bench_batch_decode.cu:135-142`).

Measures, on one real TPU chip with bf16 KV cache:
  dense   = dense paged flash-decode over the full 32K cache
  kernel  = sparse paged flash-decode over INJECTED shuffled per-head
            page indices — the reference headline's own protocol
            (`bench_batch_decode.cu` times only this kernel; estimate
            and top-k have separate benches). ``value`` = t_dense /
            t_kernel, directly comparable to the 7.03x.
  sparse  = estimate -> top-k -> sparse decode (the FULL Quest
            decode-attention pipeline as one jitted call) — a stricter
            metric than the reference's; reported as
            speedup_32k_pipeline / speedup_32k_page16 / serving keys.

Crash-proof protocol (round-4 redesign; r3's driver record was lost to
an outer wall-clock kill during a late stage):
  * The parent never touches JAX. Each measurement child runs under its
    own wall cap; a Mosaic hang in one child (the fused megakernel is
    the risk point) costs that child only.
  * Children emit ONE FLUSHED JSON LINE PER MEASUREMENT; the parent
    streams stdout live and re-prints the cumulative headline JSON
    after every update — the last JSON line on stdout is always the
    best-so-far result, so an outer kill at ANY point keeps everything
    measured up to it.
  * dense + exact + serving share ONE child (one cache fill, and every
    speedup is a same-process A/B pair — the remote-dispatch tunnel has
    ±25% cross-process variance that cancels only within a process).
  * Handoff stalls (measured r3: a child's FIRST device op can block
    100-600+ s while the tunnel tears down the previous child) are
    absorbed by a cheap tunnel probe between children, so stall time is
    not charged against a measurement child's cap.
  * A global deadline (QUEST_BENCH_DEADLINE, default 1500 s) skips
    remaining children and exits cleanly before the driver's own cap.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

T0 = time.time()
DEADLINE = float(os.environ.get("QUEST_BENCH_DEADLINE", "1500"))


def log(*a):
    print(f"[bench {time.time()-T0:6.1f}s]", *a, file=sys.stderr,
          flush=True)


def remaining() -> float:
    return DEADLINE - (time.time() - T0)


# --------------------------------------------------------------------
# Child: one measurement stage (emits one JSON line per measurement)
# --------------------------------------------------------------------

def emit(out: dict):
    print(json.dumps(out), flush=True)
    log(f"result {json.dumps(out)}")


def run_stage(stage: str, ctx: int, page: int):
    import dataclasses

    import numpy as np
    import jax

    if os.environ.get("QUEST_BENCH_CPU") == "1":
        # The axon plugin overrides JAX_PLATFORMS at import time; a CPU
        # smoke run (also used by tests) must force the backend here.
        jax.config.update("jax_platforms", "cpu")

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
    from quest_tpu.kv.paged_kv import append_prefill_at, init_cache
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.estimate import page_scores_physical
    from quest_tpu.ops.fused_decode import fused_sparse_decode
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages, serving_method
    from quest_tpu.utils.benchmarking import bench_op

    on_tpu = jax.default_backend() == "tpu"
    log(f"stage={stage} ctx={ctx} page={page} "
        f"backend={jax.default_backend()}")

    B, Hq, Hkv, D = 1, 32, 32, 128
    BUDGET = 2048 if on_tpu else 256
    model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    quest = QuestConfig(page_size=page, token_budget=BUDGET,
                        max_seq_len=ctx)
    S = quest.page_budget
    sm = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)
    iters, reps = ((8, 72), 5) if on_tpu else ((2, 6), 2)

    # Whole-pool cache (the PRODUCTION layout: shared physical pool +
    # block table + physical-page-keyed metadata) so the bench measures
    # exactly the engine's zero-copy decode path, not a gathered view.
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    bpp, maxp = cache.block_pages, cache.max_pages
    # Fill in chunks: a single bulk append's page-window RMW spans
    # the whole pool at 128K and OOMs alongside the staging arrays.
    # KV data is generated ON DEVICE — host->device transfer through
    # the tunnel relay runs at ~10 MB/s, so staging ~1 GB from numpy
    # (as round 1 did) dominates the whole stage's wall clock.
    CH = min(8192, ctx)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(cache, key, off):
        k1, k2 = jax.random.split(key)
        k_new = jax.random.normal(k1, (B, CH, Hkv, D), jnp.float32) * 0.3
        v_new = jax.random.normal(k2, (B, CH, Hkv, D), jnp.float32) * 0.3
        cache = append_prefill_at(cache, 0, k_new, v_new)
        return dataclasses.replace(
            cache, seq_lens=jnp.zeros((B,), jnp.int32) + off + CH)

    key = jax.random.PRNGKey(0)
    for off in range(0, ctx, CH):
        key, sub = jax.random.split(key)
        cache = fill(cache, sub, jnp.int32(off))
    np.asarray(cache.seq_lens)  # forced fetch: fill chain really done
    btab = cache.block_tab      # post-fill: the fill loop donates cache
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

    def sparse_env(meta_dtype=None):
        km, kn = cache.k_max, cache.k_min
        if meta_dtype is not None:
            km, kn = km.astype(meta_dtype), kn.astype(meta_dtype)
        return (cache.kv_pages, km, kn, btab)

    def make_sparse_step(method):
        def sparse_step(q, env):
            kv_pages, kmax, kmin, tab = env
            scores = page_scores_physical(q, kmax[0], kmin[0], tab,
                                          group_agg="sum")
            idx, num_valid = select_pages(scores, seq, page, S,
                                          method=method)
            return fb(q, sparse_decode_attention(
                q, kv_pages, idx, num_valid, seq, sm_scale=sm,
                layer=0, block_tab=tab, block_pages=bpp,
                sorted_selection=True))
        return sparse_step

    # Reference-protocol kernel step: the 7.03x headline's own bench
    # (`/root/reference/kernels/src/bench/bench_batch_decode.cu:45-86`)
    # times ONLY the sparse decode kernel over INJECTED shuffled random
    # per-head page indices — criticality estimation and top-k are
    # separate benches (`bench_max_possible.cu`,
    # `bench_decode_select_k.cu`; the paper quotes top-k overhead of
    # 5-10 us apart from the 7.03x). Mirror it exactly: random distinct
    # pages per head (unsorted, current page included), kernel only.
    P_pages = ctx // page
    rng2 = np.random.default_rng(1)
    inj = np.stack([np.concatenate([
        rng2.permutation(P_pages - 1)[:S - 1], [P_pages - 1]])
        for _ in range(Hkv)]).astype(np.int32)      # [Hkv, S]
    inj_idx = jnp.asarray(inj[None])                 # [1, Hkv, S]
    inj_nv = jnp.asarray([min(S, P_pages)], jnp.int32)

    def kernel_step(q, env):
        kv_pages, kmax, kmin, tab = env
        return fb(q, sparse_decode_attention(
            q, kv_pages, inj_idx, inj_nv, seq, sm_scale=sm,
            layer=0, block_tab=tab, block_pages=bpp))

    def dense_step(q, env):
        kv_pages, tab = env
        return fb(q, dense_decode_attention(
            q, kv_pages, seq, sm_scale=sm, layer=0, block_tab=tab,
            block_pages=bpp, max_pages=maxp))

    def fused_step(q, env):
        kv_pages, kmax, kmin, tab = env
        return fb(q, fused_sparse_decode(
            q, kv_pages, kmax, kmin, seq, sm_scale=sm, budget_pages=S,
            select_group=quest.fused_select_group,
            block_p=quest.fused_block_p,
            gather_slots=quest.fused_gather_slots,
            layer=0, block_tab=tab, block_pages=bpp))

    if stage == "main":
        # Round-5 protocol: every quantity is the MEDIAN of R interleaved
        # same-process repeats (bench_op calls), preceded by one discarded
        # warm-up round that pins all compiles and the tunnel handshake.
        # Round 4 measured each quantity once per session and the session
        # band was 5.69-7.43x on an unchanged pipeline — a mediocre
        # session became the official record (VERDICT r4 #1). Interleaving
        # the sparse/dense/serving steps within each round makes session
        # drift hit all sides of every ratio; the outer median rejects
        # the residual outlier rounds. Steps:
        #   unfused    = exact pipeline (the headline; "exact_fast" is
        #                verified-exact: approx_max_k + an exactness
        #                certificate with lax.cond fallback to the full
        #                sort — same selected set as lax.top_k).
        #   dense      = dense paged flash-decode baseline.
        #   serving    = fp8 e4m3 metadata (halves the estimate's HBM
        #                traffic) + the fastest sound selection for the
        #                pool size (ops/topk.py:serving_method — the SAME
        #                static rule the engine applies).
        import statistics
        R = int(os.environ.get("QUEST_BENCH_ROUNDS",
                               "5" if on_tpu else "1"))
        # Physical speed-of-light floors (v5e HBM ~819 GB/s): any slope
        # reading below 0.65x the bytes-moved floor is a MEASUREMENT
        # artifact, not a fast kernel — bench_op's paired lo/hi slopes
        # collapse toward zero when a tunnel latency-regime shift makes
        # both trip counts latency-dominated (run-2 of r5 recorded a
        # 130 us p16 pipeline at 4.1-30.6 us for three consecutive
        # rounds, 26x "speedup"). Such samples are discarded and the
        # round retried (up to 3 extra rounds); a quantity that cannot
        # collect R sane samples reports the median of what it has.
        HBM = 819e3  # bytes/us
        data_b = 2 * Hkv * BUDGET * D * 2
        meta_b = lambda bpe: 2 * Hkv * (ctx // page) * D * bpe  # noqa: E731
        FLOORS = {
            "unfused_us": (data_b + meta_b(2)) / HBM,
            "dense_us": (2 * Hkv * ctx * D * 2) / HBM,
            "serving_fp8_us": (data_b + meta_b(1)) / HBM,
            "kernel_us": data_b / HBM,
        }
        # Per-quantity trip counts: the sparse pipelines run ~90-500 us
        # per iteration, so the (8,72) chain is only 7-36 ms of device
        # work — within the tunnel's session-level latency swing, which
        # moved the p32 session MEDIAN across 88-112 us (runs 1-3)
        # while the dense baseline (53 ms chains) sat rock-stable at
        # 707-841. Longer chains put the sparse quantities in the same
        # signal regime (hi chain >= ~25 ms).
        sp_iters = (16, 288) if on_tpu else iters
        plan = [
            ("kernel_us", kernel_step, sparse_env(), sp_iters),
            ("unfused_us", make_sparse_step("exact_fast"), sparse_env(),
             sp_iters),
            ("dense_us", dense_step, (cache.kv_pages, btab), iters),
            ("serving_fp8_us",
             make_sparse_step(serving_method(quest.max_pages, S)),
             sparse_env(f8), sp_iters),
        ]
        samples: dict[str, list] = {name: [] for name, _, _, _ in plan}
        r = 0
        attempts = 0
        while r <= R and attempts < R + 4:
            attempts += 1
            ok_round = True
            for name, fn, env, its in plan:
                t = bench_op(fn, q, iters=its, reps=reps, env=env) * 1e6
                if r == 0:
                    log(f"warm-up {name}: {t:.1f} us (discarded)")
                    continue
                if on_tpu and t < 0.65 * FLOORS[name]:
                    log(f"DISCARD {name}={t:.1f}us < 0.65*floor "
                        f"{FLOORS[name]:.1f}us (physically impossible; "
                        "tunnel slope collapse)")
                    ok_round = False
                    continue
                s = samples[name]
                s.append(t)
                # Running median: the parent keeps the LAST value per
                # key, so the final emit per key is the full-R median.
                emit({name: statistics.median(s),
                      f"{name}_lo": min(s), f"{name}_hi": max(s),
                      f"{name}_n": len(s)})
            if r > 0:
                log(f"round {r}/{R} (attempt {attempts}): " + "  ".join(
                    f"{n}={samples[n][-1]:.1f}us" for n, _, _, _ in plan
                    if samples[n]))
            if r == 0 or ok_round:
                r += 1

    elif stage == "fused":
        # The fused decode megakernel (ops/fused_decode.py): estimate
        # -> EXACT in-kernel top-k -> gather -> flash decode in one
        # Pallas call. Same semantics as the unfused exact pipeline
        # (tests/test_fused_decode.py). Hang-risk stage: runs last,
        # with its own in-process dense baseline.
        log("fused: first compile+run...")
        r = jax.jit(fused_step)(q, sparse_env())
        np.asarray(r)  # host fetch: block_until_ready does not wait
        log("fused: first call ok; timing")
        t = bench_op(fused_step, q, iters=iters, reps=reps,
                     env=sparse_env())
        emit({"fused_us": t * 1e6})
        t = bench_op(dense_step, q, iters=iters, reps=reps,
                     env=(cache.kv_pages, btab))
        emit({"dense_us": t * 1e6})
        log("fused_fp8: first compile+run...")
        r = jax.jit(fused_step)(q, sparse_env(f8))
        np.asarray(r)
        log("fused_fp8: first call ok; timing")
        t = bench_op(fused_step, q, iters=iters, reps=reps,
                     env=sparse_env(f8))
        emit({"fused_fp8_us": t * 1e6})

    else:
        raise SystemExit(f"unknown stage {stage}")

    # Drop the ~0.5-1 GB pool explicitly so the child's teardown (and
    # the next child's tunnel handshake) has less to clean up.
    for arr in (cache.kv_pages, cache.k_max, cache.k_min):
        arr.delete()
    log("buffers deleted; stage done")


# --------------------------------------------------------------------
# Parent: orchestrate stages, stream children's incremental results
# --------------------------------------------------------------------

def spawn_streaming(stage: str, ctx: int, page: int, cap: float,
                    on_update):
    """Run a stage child; parse every JSON stdout line as it arrives
    (calling ``on_update(key_suffixed_dict)``), kill at ``cap``.
    Returns True if the child exited cleanly."""
    cap = max(60.0, min(cap, remaining()))
    cmd = [sys.executable, os.path.abspath(__file__),
           "--stage", stage, "--ctx", str(ctx), "--page", str(page)]
    p = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=sys.stderr,
                         cwd=os.path.dirname(os.path.abspath(__file__)))

    def reader():
        for raw in p.stdout:
            line = raw.decode().strip()
            if line.startswith("{"):
                try:
                    on_update(json.loads(line))
                except json.JSONDecodeError:
                    pass

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    try:
        p.wait(timeout=cap)
    except subprocess.TimeoutExpired:
        log(f"stage {stage}@{ctx}/p{page}: cap {cap:.0f}s hit, killing "
            "(results already streamed are kept)")
        p.kill()
        p.wait()
    th.join(timeout=10)
    if p.returncode not in (0, None):
        log(f"stage {stage}@{ctx}/p{page}: rc={p.returncode}")
    return p.returncode == 0


def probe_tunnel(max_wait: float) -> bool:
    """Wait until the axon tunnel answers a trivial device op — the
    previous child's teardown can block the next client for minutes
    (measured 100-600+ s in r3). Probe children are cheap to kill."""
    t0 = time.time()
    code = ("import jax, numpy as np;"
            "import jax.numpy as jnp;"
            "print(np.asarray(jnp.arange(8) + 1)[0])")
    while time.time() - t0 < max_wait and remaining() > 120:
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               stdout=subprocess.DEVNULL,
                               stderr=subprocess.DEVNULL, timeout=120)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        log(f"tunnel probe not ready after {time.time()-t0:.0f}s; "
            "retrying")
    return False


def main():
    if "--stage" in sys.argv:
        argv = sys.argv
        run_stage(argv[argv.index("--stage") + 1],
                  int(argv[argv.index("--ctx") + 1]),
                  int(argv[argv.index("--page") + 1]))
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
    on_tpu = (probe.startswith("tpu")
              and os.environ.get("QUEST_BENCH_CPU") != "1")
    log(f"backend probe: {probe or 'TIMEOUT'}")

    if not on_tpu:  # CPU smoke: one in-process pass, tiny shapes
        acc = {}
        spawn_streaming("main", 2048, 16, 600, acc.update)
        print(json.dumps({
            "metric": "self_attention_speedup_32k_budget2048",
            "value": 0.0, "unit": "x", "vs_baseline": 0.0,
            "note": "cpu smoke only",
            "dense_us": acc.get("dense_us"),
            "unfused_us": acc.get("unfused_us")}))
        return

    # Accumulated per-(stage, ctx, page) raw numbers. Keys are suffixed
    # e.g. unfused_us_32k, dense_main_us_128k, serving_fp8_us_32k_p32.
    raw: dict[str, float] = {}

    def headline() -> dict:
        # Same-child A/B ratios only: each pipeline's speedup uses the
        # dense baseline measured in ITS OWN child process.
        def ratio(num_key, den_key):
            if raw.get(num_key) and raw.get(den_key):
                return raw[num_key] / raw[den_key]
            return None

        def sane(key, ctx, page, bpe_meta=2):
            # Physical floor (second belt over the child-level guard):
            # a sparse-pipeline median below 0.65x speed-of-light bytes
            # is a measurement artifact and must not become a
            # candidate (see run_stage's FLOORS comment).
            v = raw.get(key)
            if not v:
                return False
            Hkv, D, BUD = 32, 128, 2048
            fl = (2 * Hkv * BUD * D * 2
                  + 2 * Hkv * (ctx // page) * D * bpe_meta) / 819e3
            if v < 0.65 * fl:
                log(f"headline: ignoring {key}={v:.1f}us "
                    f"(< 0.65*floor {fl:.1f}us)")
                return False
            return True

        result = {"metric": "self_attention_speedup_32k_budget2048",
                  "value": 0.0, "unit": "x", "vs_baseline": 0.0}
        # Exact-semantics candidates at 32K: page 16 (the reference
        # protocol config) and page 32 (same algorithm, same 2048-token
        # budget, 64 pages — VERDICT r3 #2's descriptor-size lever;
        # selection is still exact top-K by criticality bound). The
        # fused megakernel rows compete too. Every ratio is a
        # same-child A/B.
        # ``value``: the reference's OWN headline protocol. 7.03x comes
        # from `bench_batch_decode.cu` (README.md:17 / paper §4.3.1),
        # which times ONLY the sparse decode kernel over injected
        # shuffled per-head page indices — criticality estimation and
        # top-k are benched separately (`bench_max_possible.cu`,
        # `bench_decode_select_k.cu`; the paper quotes 5-10 us top-k
        # overhead apart from the headline). kernel_us mirrors that
        # protocol; the STRICTER full-pipeline (estimate -> top-k ->
        # kernel as one jitted call) speedups are reported alongside
        # as speedup_32k_pipeline / speedup_32k_page16 / serving keys.
        kcands = [(r, raw[k], raw[d], pg) for k, d, pg in
                  (("kernel_us_32k", "dense_main_us_32k", 16),
                   ("kernel_us_32k_p32", "dense_main_us_32k_p32", 32))
                  if sane(k, 32768, pg, bpe_meta=0)
                  for r in [ratio(d, k)] if r]
        if kcands:
            sp, t_k, t_d, pg = max(kcands)
            result.update(value=round(sp, 3),
                          vs_baseline=round(sp / 7.03, 3),
                          kernel_us_32k_best=round(t_k, 1),
                          kernel_page_size_32k=pg)
            if sane("kernel_us_32k", 32768, 16, bpe_meta=0):
                kp16 = ratio("dense_main_us_32k", "kernel_us_32k")
                if kp16:
                    result["speedup_32k_kernel_page16"] = round(kp16, 3)
        cands = [(r, raw[k], raw[d], pg) for k, d, pg in
                 (("unfused_us_32k", "dense_main_us_32k", 16),
                  ("unfused_us_32k_p32", "dense_main_us_32k_p32", 32),
                  ("fused_us_32k", "dense_fused_us_32k", 16))
                 if sane(k, 32768, pg)
                 for r in [ratio(d, k)] if r]
        if cands:
            sp, t_sparse, t_dense, pg = max(cands)
            result.update(speedup_32k_pipeline=round(sp, 3),
                          dense_us_32k=round(t_dense, 1),
                          sparse_us_32k=round(t_sparse, 1),
                          page_size_32k=pg)
            if sane("unfused_us_32k", 32768, 16):
                p16 = ratio("dense_main_us_32k", "unfused_us_32k")
                if p16:
                    result["speedup_32k_page16"] = round(p16, 3)
        sv = [r for k, pg in (("serving_fp8_us_32k", 16),
                              ("serving_fp8_us_32k_p32", 32))
              if sane(k, 32768, pg, bpe_meta=1)
              for r in [ratio(f"dense_main_us_32k{k[18:]}", k)] if r]
        if sv:
            result["speedup_32k_serving_cfg"] = round(max(sv), 3)
        k128 = [r for k, d, pg in
                (("kernel_us_128k", "dense_main_us_128k", 16),
                 ("kernel_us_128k_p32", "dense_main_us_128k_p32", 32))
                if sane(k, 131072, pg, bpe_meta=0)
                for r in [ratio(d, k)] if r]
        if k128:
            result["speedup_128k_kernel"] = round(max(k128), 3)
        ex128 = [r for k, d, pg in
                 (("unfused_us_128k", "dense_main_us_128k", 16),
                  ("unfused_us_128k_p32", "dense_main_us_128k_p32", 32),
                  ("fused_us_128k", "dense_fused_us_128k", 16))
                 if sane(k, 131072, pg)
                 for r in [ratio(d, k)] if r]
        if ex128:
            result["speedup_128k_budget2048"] = round(max(ex128), 3)
        sv128 = [r for k, pg in (("serving_fp8_us_128k", 16),
                                 ("serving_fp8_us_128k_p32", 32))
                 if sane(k, 131072, pg, bpe_meta=1)
                 for r in [ratio(f"dense_main_us_128k{k[19:]}", k)] if r]
        if sv128:
            result["speedup_128k_serving_cfg"] = round(max(sv128), 3)
        for k, v in sorted(raw.items()):
            result[k] = round(v, 1)
        return result

    def on_update_for(stage, suffix):
        def on_update(d):
            for k, v in d.items():
                key = f"dense_{stage}_us" if k == "dense_us" else k
                raw[f"{key}_{suffix}"] = v
            # Re-print the cumulative result: the LAST JSON line on
            # stdout is always the best-so-far record.
            print(json.dumps(headline()), flush=True)
        return on_update

    def suffix_of(ctx, page):
        s = "32k" if ctx == 32768 else "128k"
        return s if page == 16 else f"{s}_p{page}"

    # Schedule: headline children first, hang-risk (fused) children
    # last; within the deadline, later children only add detail.
    # Page 32 keeps the 2048-token budget (64 pages, exact selection);
    # measured on chip it halves the metadata stream and gathers in
    # 16 KB descriptors — the 32K headline config
    # (exp/r4_chip/page32_ab.log: 78-94 us vs 137-161 at page 16).
    SCHEDULE = [
        ("main", 32768, 32, 780),
        ("main", 32768, 16, 780),
        ("main", 131072, 32, 720),
        ("main", 131072, 16, 720),
        ("fused", 32768, 16, 900),
        ("fused", 131072, 16, 900),
    ]
    done_first = False
    for stage, ctx, page, cap in SCHEDULE:
        if remaining() < 240:
            log(f"deadline: skipping {stage}@{ctx} "
                f"({remaining():.0f}s left)")
            continue
        if done_first:
            probe_tunnel(max_wait=min(600, remaining() - 180))
        suffix = suffix_of(ctx, page)
        spawn_streaming(stage, ctx, page, cap,
                        on_update_for(stage, suffix))
        done_first = True
        # The 32K headline children are the round's record: if one
        # produced nothing (handoff stall ate its cap), retry once.
        if (stage, ctx) == ("main", 32768) and \
                f"unfused_us_{suffix}" not in raw and remaining() > 600:
            log("32K main child produced nothing; retrying once")
            probe_tunnel(max_wait=min(600, remaining() - 300))
            spawn_streaming(stage, ctx, page, cap,
                            on_update_for(stage, suffix))

    result = headline()
    # Bytes-moved accounting (NVBench analogue,
    # `bench_batch_decode.cu:82-86`).
    if result.get("sparse_us_32k"):
        bpe, CTX, BUDGET, Hkv, D = 2, 32768, 2048, 32, 128
        page = result.get("page_size_32k", 16)
        dense_bytes = 2 * Hkv * CTX * D * bpe
        sparse_bytes = (2 * Hkv * BUDGET * D * bpe          # selected
                        + 2 * Hkv * (CTX // page) * D * bpe)  # metadata
        log(f"dense:  {result['dense_us_32k']:8.1f} us  "
            f"({dense_bytes/result['dense_us_32k']/1e3:.0f} GB/s)")
        log(f"sparse: {result['sparse_us_32k']:8.1f} us  "
            f"({sparse_bytes/result['sparse_us_32k']/1e3:.0f} GB/s)")
        log(f"speedup: {result['value']:.2f}x "
            "(reference headline: 7.03x)")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
