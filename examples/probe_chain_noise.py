"""Direct measurement of the staged chain kernel's noise share at 768^3.

Scans the staged-slab chain kernel (the 768^3 production down-phase)
with the state carried, with_noise True vs False — the difference is
the exact on-chip cost of the Box-Muller noise stream, completing the
VPU-gap decomposition (VERDICT round-2 item 4; BENCH_NOTES).

Run on TPU: [PROBE_N=768] [PROBE_STEPS=24] python examples/probe_chain_noise.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(os.environ.get("PROBE_N", "768"))
STEPS = int(os.environ.get("PROBE_STEPS", "24"))


def main():
    from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_2d_staged

    hinv2 = float((N - 1) ** 2)
    coeffs = jnp.full((6,), -hinv2, jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, N, N), jnp.float32) * 0.01
    zx2 = jnp.zeros((N // 2, N // 2, N), jnp.float32)

    def run(with_noise):
        def step(c, i):
            xc = c
            out = fused_chain_down_2d_staged(
                xc, None, coeffs, 1.0, hinv2, 1.0,
                3, i, zx2=zx2, with_noise=with_noise,
            )
            return out[0], None

        return jax.jit(
            lambda x0: jax.lax.scan(step, x0, jnp.arange(STEPS))[0]
        )

    for wn in (True, False, True):
        f = run(wn)
        y = f(x)
        float(jnp.sum(y))  # fence
        t0 = time.perf_counter()
        y = f(x)
        float(jnp.sum(y))
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        print(f"with_noise={wn}: {dt:.2f} ms/kernel")


if __name__ == "__main__":
    main()
