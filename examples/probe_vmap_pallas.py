"""Can a pallas_call with SMEM scalar inputs be vmapped on TPU?

probe_multichain found that vmapping the fused chain kernel fails:
the auto-batching rule turns the (4,) SMEM iscal into a (B, 4) array
with a (Squeezed, Blocked(4)) block spec that Mosaic rejects (sublane
rule).  This probe tries the candidate workarounds on a minimal kernel:

  a) baseline        : (4,) SMEM scalar input, vmap over x AND iscal
  b) bcast-scalars   : vmap with in_axes=None for iscal (shared scalars)
  c) 2d-scalars      : iscal passed as (1, 4), kernel indexes [0, k]

Run on TPU: python examples/probe_vmap_pallas.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make(two_d):
    def kernel(iscal_ref, x_ref, o_ref):
        s = iscal_ref[0, 1] if two_d else iscal_ref[1]
        o_ref[...] = x_ref[...] * s.astype(jnp.float32)

    def fn(iscal, x):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(iscal, x)

    return fn


def main():
    x = jnp.ones((4, 16, 256), jnp.float32)
    iscal = jnp.tile(jnp.asarray([3, 2, 1, 0], jnp.int32), (4, 1))

    for name, fn, axes, args in (
        ("baseline", make(False), (0, 0), (iscal, x)),
        ("bcast-scalars", make(False), (None, 0), (iscal[0], x)),
        ("2d-scalars", make(True), (0, 0), (iscal[:, None, :], x)),
    ):
        try:
            out = jax.jit(jax.vmap(fn, in_axes=axes))(*args)
            ok = bool(jnp.all(out[0] == 2.0))
            print(f"  {name:14s} OK (values {'right' if ok else 'WRONG'})")
        except Exception as e:
            msg = str(e).split("\n")[0][:100]
            print(f"  {name:14s} {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
