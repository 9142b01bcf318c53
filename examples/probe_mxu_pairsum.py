"""Mosaic probe: lane pair-sum via an MXU matmul with a 0/1 matrix.

The chain kernels emit the restricted residual with sublane pairs
summed but lane pairs NOT summed (rq, lanes at fine N2) because Mosaic
vector ops cannot pair-sum lanes (gathers are same-width vreg shuffles
only — CLAUDE.md).  The XLA pass that finishes the job costs a full
read+write of rq plus a launch (glue_rc, 0.71 ms at 512^3).  This
probe checks the alternative: rc = rp @ S on the MXU, where
S[k, c] = 1 if k // 2 == c (built in-kernel from iotas, so no HBM
constant).  Exactness: each rc entry sums exactly two f32 values (the
rest are x*0), and the v5e MXU's f32 path is bf16x3-decomposed, so the
result may differ from a vector add in the last ulp — measured here.

Run on TPU: python examples/probe_mxu_pairsum.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kern(x_ref, o_ref, *, N1, N2):
    k = jax.lax.broadcasted_iota(jnp.int32, (N2, N2 // 2), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (N2, N2 // 2), 1)
    S = (k // 2 == c).astype(jnp.float32)
    o_ref[:] = jnp.dot(x_ref[:], S, preferred_element_type=jnp.float32)


def main():
    N1, N2 = 256, 512
    x = jax.random.normal(jax.random.PRNGKey(0), (N1, N2), jnp.float32)
    fn = pl.pallas_call(
        lambda x_ref, o_ref: _kern(x_ref, o_ref, N1=N1, N2=N2),
        out_shape=jax.ShapeDtypeStruct((N1, N2 // 2), jnp.float32),
    )
    got = np.asarray(jax.jit(fn)(x))
    ref = np.asarray(x)[:, 0::2] + np.asarray(x)[:, 1::2]
    bit = (got == ref).all()
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"2D dot pair-sum: bit-identical={bit} max rel gap={rel:.2e}")

    # 3D variant as the chain kernel would use it: (T/2 unrolled rows)
    def kern3(x_ref, o_ref):
        k = jax.lax.broadcasted_iota(jnp.int32, (N2, N2 // 2), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (N2, N2 // 2), 1)
        S = (k // 2 == c).astype(jnp.float32)
        for r in range(2):
            o_ref[r] = jnp.dot(
                x_ref[r], S, preferred_element_type=jnp.float32
            )

    x3 = jax.random.normal(jax.random.PRNGKey(1), (2, N1, N2), jnp.float32)
    fn3 = pl.pallas_call(
        kern3,
        out_shape=jax.ShapeDtypeStruct((2, N1, N2 // 2), jnp.float32),
    )
    got3 = np.asarray(jax.jit(fn3)(x3))
    ref3 = np.asarray(x3)[..., 0::2] + np.asarray(x3)[..., 1::2]
    print(
        f"3D rows dot pair-sum: bit-identical={(got3 == ref3).all()} "
        f"max rel gap={np.abs(got3 - ref3).max() / np.abs(ref3).max():.2e}"
    )

    # timing: 512 coarse rows' worth of matmuls in one kernel
    def kern_many(x_ref, o_ref):
        k = jax.lax.broadcasted_iota(jnp.int32, (N2, N2 // 2), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (N2, N2 // 2), 1)
        S = (k // 2 == c).astype(jnp.float32)
        for r in range(8):
            o_ref[r] = jnp.dot(
                x_ref[r], S, preferred_element_type=jnp.float32
            )

    xm = jax.random.normal(
        jax.random.PRNGKey(2), (256, 8, N1, N2), jnp.float32
    )
    fnm = jax.jit(jax.vmap(pl.pallas_call(
        kern_many,
        out_shape=jax.ShapeDtypeStruct((8, N1, N2 // 2), jnp.float32),
    )))
    out = fnm(xm)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = fnm(xm)
    float(jnp.sum(out))
    dt = time.perf_counter() - t0
    gmac = 256 * 8 * N1 * N2 * (N2 // 2) / 1e9
    print(f"2048 row-matmuls: {dt * 1e3:.2f} ms ({gmac / dt:.0f} GMAC/s)")


if __name__ == "__main__":
    main()
