"""Compile-only bisect of the in-kernel exact top-K select at SG>1.

The full megakernel compiles and runs at select_group=1 but SG>=2
SIGABRTs the TPU compiler (layout.h Check failed: arr.size() >=
layout_rank). This driver compiles a minimal pallas kernel wrapping
just `_exact_topk_select` (+ optional compaction) at a given SG, using
AOT lower().compile() with ShapeDtypeStructs — nothing executes, so a
bad kernel cannot hang the worker.

Usage: python exp/select_compile.py SG [rows lanes K] [--compact]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quest_tpu.ops.fused_decode import _compact_ids, _exact_topk_select


def main():
    SG = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    compact = "--compact" in sys.argv
    Kp = ((K + 127) // 128) * 128

    def kernel(np_ref, s_ref, o_ref, idx_ref):
        sel, slot, nv = _exact_topk_select(s_ref[...], SG, np_ref[0],
                                           np_ref[0] - 1, K)
        o_ref[...] = sel
        if compact:
            for h in range(SG):
                ids = _compact_ids(sel[h * rows:(h + 1) * rows],
                                   slot[h * rows:(h + 1) * rows], Kp)
                idx_ref[pl.ds(h, 1), :] = ids.astype(jnp.int32)
        else:
            idx_ref[...] = jnp.zeros((SG, Kp), jnp.int32)

    @jax.jit
    def run(s, np_):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec((SG * rows, lanes),
                                       lambda t, *_: (0, 0))],
                out_specs=[
                    pl.BlockSpec((SG * rows, lanes),
                                 lambda t, *_: (0, 0)),
                    pl.BlockSpec((SG, Kp), lambda t, *_: (0, 0)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((SG * rows, lanes), jnp.int32),
                jax.ShapeDtypeStruct((SG, Kp), jnp.int32),
            ],
        )(np_, s)

    s = jax.ShapeDtypeStruct((SG * rows, lanes), jnp.float32)
    np_ = jax.ShapeDtypeStruct((4,), jnp.int32)
    run.lower(s, np_).compile()
    print(f"OK SG={SG} rows={rows} lanes={lanes} K={K} "
          f"compact={compact}")


if __name__ == "__main__":
    main()
