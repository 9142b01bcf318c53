"""What can the staged-slab DMA pattern itself sustain, and does VPU
work overlap it?

Replicates the staged 2D chain kernel's dataflow — grid (N1/T1,
N0/T0+1), double-buffered (T0, W1, N2) input slabs prefetched one grid
step ahead, (T0, T1, N2) xpy + (T0/2, T1/2, N2) rq output blocks — with
the stencil phases replaced by K synthetic VPU passes over a slab
(K=0: pure DMA pipeline).  If time(K) ~= max(DMA, VPU) the hardware
overlaps and the chain kernel is simply VPU-bound; if time(K) ~=
DMA + VPU the pipeline serializes and restructuring (or VPU reduction)
is the lever.

Run on TPU: python examples/probe_dma_floor.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("PROBE_N", "768"))
STEPS = int(os.environ.get("PROBE_STEPS", "32"))
_JB2 = 8


def _kernel(x_hbm, xpy_ref, rq_ref, xdma, work, sem, *, T0, T1, shape, K):
    N0, N1, N2 = shape
    G0 = N0 // T0
    G1 = N1 // T1
    W1 = min(T1 + 2 * _JB2, N1)
    i1 = pl.program_id(0)
    i0 = pl.program_id(1)
    t = i1 * (G0 + 1) + i0
    slot = t % 2

    def copies(i1t, i0t, sl):
        s1t = pl.multiple_of(
            jnp.clip(i1t * T1 - _JB2, 0, N1 - W1), _JB2
        )
        r0t = pl.multiple_of(jnp.minimum(i0t, G0 - 1) * T0, 2)
        return [
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(r0t, T0), pl.ds(s1t, W1)],
                xdma.at[sl],
                sem.at[0, sl],
            )
        ]

    @pl.when(t == 0)
    def _first():
        for c in copies(0, 0, 0):
            c.start()

    @pl.when(t + 1 < G1 * (G0 + 1))
    def _prefetch():
        i0n = i0 + 1
        wrap = i0n > G0
        i1n = jnp.where(wrap, i1 + 1, i1)
        i0n = jnp.where(wrap, 0, i0n)
        for c in copies(i1n, i0n, 1 - slot):
            c.start()

    for c in copies(i1, i0, slot):
        c.wait()

    s1 = pl.multiple_of(jnp.clip(i1 * T1 - _JB2, 0, N1 - W1), _JB2)
    base1 = pl.multiple_of(i1 * T1 - s1, _JB2)

    # K synthetic VPU passes over a (T0, W1, N2) slab (sequential
    # dependency so nothing folds away)
    acc = xdma[slot]
    for _ in range(K):
        acc = acc * 1.0000001 + 0.0000001
    work[:] = acc

    xpy_ref[:] = work[:, pl.ds(base1, T1)] * 2.0
    rq_ref[:] = work[0 : T0 // 2, 0 : T1 // 2] + 1.0


def run(x, *, T0, T1, K):
    N0, N1, N2 = x.shape
    G0, G1 = N0 // T0, N1 // T1
    W1 = min(T1 + 2 * _JB2, N1)
    from parmgmc_tpu.kernels.rb_gibbs import _compiler_params

    grid = (G1, G0 + 1)
    kern = functools.partial(
        _kernel, T0=T0, T1=T1, shape=x.shape, K=K
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec(
                (T0, T1, N2),
                lambda i1, i0: (jnp.maximum(i0 - 1, 0), i1, 0),
            ),
            pl.BlockSpec(
                (T0 // 2, T1 // 2, N2),
                lambda i1, i0: (jnp.maximum(i0 - 1, 0), i1, 0),
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N0, N1, N2), x.dtype),
            jax.ShapeDtypeStruct((N0 // 2, N1 // 2, N2), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, T0, W1, N2), x.dtype),
            pltpu.VMEM((T0, W1, N2), x.dtype),
            pltpu.SemaphoreType.DMA((1, 2)),
        ],
        compiler_params=_compiler_params(),
    )(x)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, N, N), jnp.float32)

    for T0, T1 in ((16, 128), (8, 128)):
        for K in (0, 2, 4, 8, 16):
            fn = jax.jit(
                lambda x0, T0=T0, T1=T1, K=K: jax.lax.scan(
                    lambda c, _: (run(c, T0=T0, T1=T1, K=K)[0], None),
                    x0,
                    None,
                    length=STEPS,
                )[0]
            )
            try:
                out = fn(x)
                float(jnp.sum(out))
                t0 = time.perf_counter()
                out = fn(x)
                float(jnp.sum(out))
                dt = (time.perf_counter() - t0) / STEPS * 1e3
                print(
                    f"  tile ({T0:2d},{T1:3d}) K={K:2d}: {dt:7.3f} ms/step"
                )
            except Exception as e:
                print(f"  tile ({T0},{T1}) K={K}: {type(e).__name__}: {e}")
                break


if __name__ == "__main__":
    main()
