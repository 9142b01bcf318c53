"""Probe: noise-draw share of the multichain mesh MGMC step (round 4).

A) keyed step (threefry draws inside)           — production path
B) step_with_noise with CLOSED-OVER zero noises — same math, no PRNG

The difference isolates the threefry normal cost at (n, C) per level.
Also times C=512 to check the chain-axis scaling curve past 256.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from parmgmc_tpu.models.matern import MaternMeshSampler
from parmgmc_tpu.samplers.gibbs import _draw


def force(v):
    return float(jnp.sum(v))


def main():
    ms = MaternMeshSampler(
        mesh_file="/root/reference/data/wrench.msh", kappa=5.0,
        refinements=3, dtype=jnp.float32, coarsest_size=128,
    )
    mg = ms.sampler
    n = ms.n
    for C in (256, 512):
        X0 = jnp.zeros((n, C), jnp.float32)

        def run_keyed(k, x):
            def body(c, _):
                kk, xx = mg.step(c[0], c[1], None)
                return (kk, xx), None
            (k, x), _ = jax.lax.scan(body, (k, x), None, length=32)
            return x

        zeros = _draw(jax.random.PRNGKey(0), mg.noise_shapes(), jnp.float32, (C,))
        zeros = jax.tree_util.tree_map(jnp.zeros_like, zeros)

        def run_zero(x):
            def body(xx, _):
                return mg.step_with_noise(xx, None, zeros), None
            x, _ = jax.lax.scan(body, x, None, length=32)
            return x

        fk = jax.jit(run_keyed)
        fz = jax.jit(run_zero)
        force(fk(jax.random.PRNGKey(0), X0))
        force(fz(X0))
        tk = tz = np.inf
        for _ in range(3):
            t0 = time.perf_counter(); force(fk(jax.random.PRNGKey(0), X0))
            tk = min(tk, (time.perf_counter() - t0) / 32)
            t0 = time.perf_counter(); force(fz(X0))
            tz = min(tz, (time.perf_counter() - t0) / 32)
        print(f"C={C}: keyed {tk*1e3:6.2f} ms/step  zero-noise {tz*1e3:6.2f} "
              f"ms/step  -> noise share {((tk-tz))*1e3:5.2f} ms "
              f"({C/tk:,.0f} samples/s aggregate)", flush=True)


if __name__ == "__main__":
    main()
