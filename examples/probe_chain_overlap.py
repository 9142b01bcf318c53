"""Does the whole-plane chain kernel overlap DMA with VPU work?

The staged-slab chain kernel at 512^3 measures ~7.2 ms vs a ~5.0 ms
HBM floor (1.79 GB at 360 GB/s) — suspiciously close to floor + the
~2.2 ms VPU estimate (3 stencil stages + Box-Muller), i.e. the SUM
rather than the max.  This probe times the kernel with the noise flag
on/off and with the z carry on/off: if noise-off saves its full VPU
cost, DMA and compute are NOT overlapping and overlap (or VPU work
reduction) is the remaining lever; if times barely move, the kernel is
DMA-bound and 360 GB/s is simply what this access pattern achieves.

Run on TPU: [PROBE_N=512] python examples/probe_chain_overlap.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(os.environ.get("PROBE_N", "512"))
STEPS = int(os.environ.get("PROBE_STEPS", "128"))


def main():
    from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_fd

    n0 = n1 = n2 = N
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n0, n1, n2), jnp.float32)
    b = jnp.zeros((n0, n1, n2), jnp.float32)
    z = jax.random.normal(key, (n0 // 2, n1 // 2, n2), jnp.float32) * 0.01
    coeffs = jnp.full((6,), -1.0, jnp.float32)

    def chain(x0, z0, b0, with_noise, with_z, steps):
        def body(c, _):
            xc, zc = c
            out = fused_chain_down_fd(
                xc,
                b0,
                coeffs,
                jnp.float32(1.0),
                jnp.float32(4.0),
                jnp.float32(1.0),
                seed=7,
                step=3,
                with_noise=with_noise,
                zx2=zc if with_z else None,
            )
            xpy, rq = out[0], out[1]
            return (xpy, zc), None

        return jax.lax.scan(body, (x0, z0), None, length=steps)

    def timed(with_noise, with_z):
        # x/z/b as jit ARGUMENTS: closing over them embeds 0.5 GB
        # program constants and stalls the remote compile (CLAUDE.md)
        fn = jax.jit(
            lambda x0, z0, b0: chain(x0, z0, b0, with_noise, with_z, STEPS)[
                0
            ][0]
        )
        out = fn(x, z, b)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        out = fn(x, z, b)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / STEPS * 1e3

    base = timed(True, True)
    nonoise = timed(False, True)
    print(f"{N}^3 chain kernel alone ({STEPS}-step scans):")
    print(f"  noise+z   {base:7.3f} ms/step")
    print(f"  z only    {nonoise:7.3f} ms/step  (noise VPU share {base - nonoise:+.3f})")


if __name__ == "__main__":
    main()
