"""AWQ — activation-aware weight quantization (Lin et al., 2306.00978).

The reference's best end-to-end row (2.23x at 32K/2048,
`/root/reference/README.md:17,102`) uses 4-bit AWQ weights produced by
the external llm-awq tool. This module implements the algorithm
natively for the stacked-params pytree (models/llama.py):

  1. **Calibrate**: one eager forward pass over calibration tokens with
     the linear weights wrapped in ``RecordingLinear`` — each qdot
     records the per-input-channel mean |activation| and a row
     subsample of its input, per layer, in call order.
  2. **Search**: per linear, grid-search the AWQ scale exponent
     alpha ∈ [0, 1]: scale the salient input channels up before
     rounding (``s = a_mean^alpha``, geomean-normalized), quantize
     ``W * s``, and keep the alpha minimizing the output MSE
     ``|| X @ W  -  (X / s) @ Q(W s) ||`` on the calibration sample.
     alpha = 0 degenerates to plain RTN.
  3. **Fold**: the inverse scale rides the QuantizedLinear as
     ``inv_s`` and qdot applies it to the activation — one fused
     elementwise multiply, no extra HBM traffic (AWQ proper folds it
     into the previous norm; the elementwise form is numerically
     identical and keeps the pytree self-contained).

Calibration runs EAGERLY (no jit) so the recording wrappers can
mutate their Python-side stores; a tiny token batch suffices (AWQ
needs channel statistics, not gradients). With no real checkpoints in
this environment the property that IS verifiable — and tested
(tests/test_quantize.py) — is the algorithmic one: AWQ-int4 output
error <= RTN-int4 output error on held-out activations, and exact
equivalence of the folded runtime path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from quest_tpu.models.quantize import (QUANT_KEYS, QuantizedLinear,
                                       dequantize_weight, quantize_weight)


@dataclasses.dataclass
class RecordingLinear:
    """Eager-only qdot wrapper: behaves like the plain weight, records
    its input statistics into ``store[name]`` (one entry per call, i.e.
    per layer for stacked weights)."""
    w: jnp.ndarray
    name: str
    store: Dict[str, List]
    max_rows: int = 64

    def record_and_matmul(self, x):
        xf = np.asarray(x.astype(jnp.float32)).reshape(-1, x.shape[-1])
        ent = {"a_mean": np.abs(xf).mean(axis=0),
               "rows": xf[np.random.default_rng(0).permutation(
                   xf.shape[0])[:self.max_rows]]}
        self.store.setdefault(self.name, []).append(ent)
        return x @ self.w


jax.tree_util.register_pytree_node(
    RecordingLinear,
    lambda r: ((r.w,), (r.name, r.store, r.max_rows)),
    lambda aux, ch: RecordingLinear(ch[0], *aux),
)


def awq_calibrate(model, params: Dict[str, Any], cache,
                  tokens: jnp.ndarray, max_rows: int = 64):
    """Run one eager prefill over ``tokens`` recording every linear's
    input. Returns {name: [per-layer entry, ...]} in layer order."""
    store: Dict[str, List] = {}

    def wrap(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = wrap(v, prefix + k + ".")
            elif k in QUANT_KEYS or k == "lm_head":
                out[k] = RecordingLinear(v, k, store, max_rows)
            else:
                out[k] = v
        return out

    model.prefill_last(wrap(params), cache, tokens)
    return store


def awq_search_scale(w: jnp.ndarray, a_mean: np.ndarray,
                     x_rows: np.ndarray, bits: int,
                     n_grid: int = 20):
    """Per-layer AWQ scale search. w: [in, out]; a_mean/x_rows from
    calibration. Returns (inv_s [in] f32, best_alpha, errs)."""
    wf = np.asarray(w, np.float32)
    x = np.asarray(x_rows, np.float32)
    ref = x @ wf
    am = np.maximum(a_mean, 1e-5)
    best = (None, None, np.inf)
    errs = []
    for gi in range(n_grid):
        alpha = gi / (n_grid - 1)
        s = am ** alpha
        s = s / np.exp(np.log(s).mean())          # geomean 1
        qw = quantize_weight(jnp.asarray(wf * s[:, None]), bits)
        deq = np.asarray(dequantize_weight(qw, jnp.float32))
        err = float(np.mean(((x / s) @ deq - ref) ** 2))
        errs.append(err)
        if err < best[2]:
            best = (s, alpha, err)
    s, alpha, _ = best
    return (1.0 / s).astype(np.float32), alpha, errs


def awq_quantize_params(model, params: Dict[str, Any], cache,
                        tokens: jnp.ndarray, bits: int = 4,
                        n_grid: int = 20) -> Dict[str, Any]:
    """Calibrate + search + quantize the whole stacked pytree. Linears
    become QuantizedLinear with folded ``inv_s``; embeddings/norms pass
    through."""
    calib = awq_calibrate(model, params, cache, tokens)

    def quant_stacked(name, w):
        ents = calib[name]
        L = w.shape[0]
        assert len(ents) == L, (name, len(ents), L)
        inv, qs, ss = [], [], []
        for l in range(L):
            inv_s, _, _ = awq_search_scale(w[l], ents[l]["a_mean"],
                                           ents[l]["rows"], bits, n_grid)
            ql = quantize_weight(
                jnp.asarray(np.asarray(w[l], np.float32)
                            / inv_s[:, None]), bits)
            inv.append(inv_s)
            qs.append(ql.q)
            ss.append(ql.s)
        return QuantizedLinear(q=jnp.stack(qs), s=jnp.stack(ss),
                               bits=bits,
                               inv_s=jnp.asarray(np.stack(inv)))

    out = {"embed": params["embed"], "final_norm": params["final_norm"],
           "layers": {}}
    for k, v in params["layers"].items():
        out["layers"][k] = (quant_stacked(k, v) if k in QUANT_KEYS
                            else v)
    lm = params["lm_head"]
    ent = calib["lm_head"][0]
    inv_s, _, _ = awq_search_scale(lm, ent["a_mean"], ent["rows"], bits,
                                   n_grid)
    ql = quantize_weight(jnp.asarray(
        np.asarray(lm, np.float32) / inv_s[:, None]), bits)
    out["lm_head"] = QuantizedLinear(q=ql.q, s=ql.s, bits=bits,
                                     inv_s=jnp.asarray(inv_s))
    return out
