"""Is the 2D kernels' noise cost in the PRNG seed granularity?

The staged 768^3 chain kernel's noise ablation reads +7.9 ms
(examples/probe_chain768.py, 2026-08-19) for ~5.3e8 Box-Muller values
per step, while the 1D whole-plane kernels (one seed per row pair,
whole-plane draws) pay ~23 ps/value.  The 2D kernels seed the hardware
PRNG per (row-pair, 8-column-block) — 112 seeds/row-pair at 768 wide —
because window starts are only 8-aligned (halo noise must regenerate
bit-identically across overlapping windows).

This probe times noise generation alone at the three candidate
granularities, at the 768^3 volume and dataflow shape (grid of 384 row
pairs, 112 8-blocks' worth of (2, ., 768) draws each):

  blk8   : 14 draws of (2, 8, 768) per 96-strip     (current keying)
  blk32  : 3 draws of (2, 32, 768) + 2 partial 32-draws statically
           sliced to their 8-wide halo piece        (proposed keying)
  strip  : 1 draw of (2, 112, 768)                  (batching upper bound)

Run on TPU: python examples/probe_noise_blocks.py [STEPS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from jax.experimental.pallas import tpu as pltpu

from parmgmc_tpu.kernels.rb_gibbs import _compiler_params, _eta_draw, _mix

N2 = 768
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
NPAIR = 384  # row pairs at 768^3
NSTRIP = 8  # 96-wide strips per plane


def _variant(mode):
    def kernel(su_ref, out_ref):
        su = su_ref[0].astype(jnp.uint32)
        g = pl.program_id(0).astype(jnp.uint32)
        acc = jnp.zeros((8, N2), jnp.float32)
        # 8 strips of T1=96: window [s1-8, s1+96+8) = 112 columns
        for s in range(NSTRIP):
            base = s * 12  # global 8-block index of the strip start
            if mode == "blk8":
                for q in range(14):  # 112/8 blocks incl. halos
                    jb = jnp.uint32((base - 1 + q) & 0xFFFFFFFF)
                    ee, eo = _eta_draw(_mix(_mix(su, g), jb), 8, N2)
                    acc = acc + ee + eo
            elif mode == "blk32":
                # left halo: cols [24,32) of 32-block (base-1)//4
                jb = jnp.uint32(((base - 8) // 4) & 0xFFFFFFFF)
                ee, eo = _eta_draw(_mix(_mix(su, g), jb), 32, N2)
                acc = acc + ee[24:32] + eo[24:32]
                for q in range(3):  # interior 32-blocks
                    jb = jnp.uint32(base // 4 + q)
                    ee, eo = _eta_draw(_mix(_mix(su, g), jb), 32, N2)
                    acc = (
                        acc
                        + ee[0:8] + ee[8:16] + ee[16:24] + ee[24:32]
                        + eo[0:8] + eo[8:16] + eo[16:24] + eo[24:32]
                    )
                # right halo: cols [0,8) of 32-block (base+96)/32
                jb = jnp.uint32(base // 4 + 3)
                ee, eo = _eta_draw(_mix(_mix(su, g), jb), 32, N2)
                acc = acc + ee[0:8] + eo[0:8]
            else:  # strip
                jb = jnp.uint32(base)
                ee, eo = _eta_draw(_mix(_mix(su, g), jb), 112, N2)
                for q in range(14):
                    acc = acc + ee[8 * q : 8 * (q + 1)]
                    acc = acc + eo[8 * q : 8 * (q + 1)]
        out_ref[...] = acc[None]

    def fn(su):
        return pl.pallas_call(
            kernel,
            grid=(NPAIR,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(
                (1, 8, N2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((NPAIR, 8, N2), jnp.float32),
            compiler_params=_compiler_params(),
        )(su)

    return fn


def main():
    for mode in ("blk8", "blk32", "strip"):
        fn = _variant(mode)

        @jax.jit
        def run(s0):
            def body(c, _):
                out = fn(c)
                return c + jnp.int32(1) + (out[0, 0, :1] > 99).astype(
                    jnp.int32
                ), None

            return jax.lax.scan(body, s0, None, length=STEPS)[0]

        s0 = jnp.zeros((1,), jnp.int32)
        try:
            float(jnp.sum(run(s0)))
            t0 = time.perf_counter()
            float(jnp.sum(run(s0)))
            dt = (time.perf_counter() - t0) / STEPS * 1e3
            print(f"  {mode:6s} {dt:7.3f} ms/step")
        except Exception as e:
            print(f"  {mode}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
