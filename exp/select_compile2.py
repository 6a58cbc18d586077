"""Op-level bisect of the SG>1 Mosaic layout crash. Compile-only.

Usage: python exp/select_compile2.py STAGE [SG]
stages: reduce3 cumsum full radix thr slice2d dot2d
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quest_tpu.ops.fused_decode import _band_cumsum

STAGE = sys.argv[1]
SG = int(sys.argv[2]) if len(sys.argv) > 2 else 2
R, L = 16, 128


def kernel(s_ref, o_ref):
    s = s_ref[...]
    if STAGE == "reduce3":
        r = jnp.sum(s, axis=(1, 2), keepdims=True)      # [SG,1,1]
        o_ref[...] = s + r
    elif STAGE == "cumsum":
        o_ref[...] = _band_cumsum(
            s.astype(jnp.int32).reshape(SG * R, L),
            R).astype(jnp.float32).reshape(SG, R, L)
    elif STAGE == "full":
        k_rem = jnp.full((SG, 1, 1), jnp.int32(5), jnp.int32)
        o_ref[...] = s + k_rem.astype(jnp.float32)
    elif STAGE == "radix":
        b = jax.lax.bitcast_convert_type(s, jnp.int32)
        key = jnp.where(b < 0, b ^ jnp.int32(0x7FFFFFFF), b)
        active = jnp.ones(s.shape, jnp.int32)
        k_rem = jnp.full((SG, 1, 1), jnp.int32(128), jnp.int32)
        one = jnp.int32(1)
        for sh in range(31, 29, -1):
            bit = (jax.lax.shift_right_logical(key, jnp.int32(sh)) & one)
            bit_hi = (one - bit) if sh == 31 else bit
            hi = active * bit_hi
            c = jnp.sum(hi, axis=(1, 2), keepdims=True)
            go_hi = c >= k_rem
            active = jnp.where(go_hi, hi, active * (one - bit_hi))
            k_rem = jnp.where(go_hi, k_rem, k_rem - c)
        o_ref[...] = active.astype(jnp.float32)
    elif STAGE == "thr":
        key = s.astype(jnp.int32)
        active = (key > 3).astype(jnp.int32)
        thr = jnp.max(jnp.where(active > 0, key, jnp.int32(-2147483648)),
                      axis=(1, 2), keepdims=True)
        o_ref[...] = (key > thr).astype(jnp.float32)
    elif STAGE == "slice2d":
        row_tot = s[:, :, L - 1]                        # [SG, R]
        o_ref[...] = s + row_tot[:, :, None]
    elif STAGE == "dot2d":
        row_tot = s[:, :, L - 1]                        # [SG, R]
        ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
        tri = (ri < rj).astype(jnp.float32)
        off = jax.lax.dot_general(row_tot, tri, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[...] = s + off[:, :, None]
    else:
        raise SystemExit(f"unknown stage {STAGE}")


@jax.jit
def run(s):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SG, R, L), jnp.float32),
    )(s)


run.lower(jax.ShapeDtypeStruct((SG, R, L), jnp.float32)).compile()
print(f"OK stage={STAGE} SG={SG}")
