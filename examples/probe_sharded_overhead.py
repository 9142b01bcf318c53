"""Measure the sharded-fused MGMC cycle's NON-ICI overheads on one chip.

VERDICT item 5: the 16-chip projection's load-bearing terms (extra
glue, halo copies, replicated coarse tail) were modeled, never
measured.  The axon platform exposes ONE device, so this runs the
production `make_sharded_mgmc_step` over a 1-device mesh — every
shard_map boundary, halo ppermute (self-loop), per-shard kernel split
and replicated-tail pass still executes, with zero actual ICI traffic
— and compares ms/cycle against the unsharded flagship step on the
same 256^3 / 512^3 operators (pass sizes as argv to probe others,
e.g. 768 — VERDICT r4 item 6 asks whether per-shard blocks re-enter
the whole-plane kernel regime at 768^3/1024^3 under sharding).

    sharded(1 dev) / unsharded = the pure machinery overhead
    projected(n dev) = sharded_glue + kernel_time/n + tail (replicated)

Run on the TPU:  python examples/probe_sharded_overhead.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from parmgmc_tpu.models.problems import gmrf_3d
from parmgmc_tpu.parallel.fused import make_sharded_mgmc_step
from parmgmc_tpu.samplers.mgmc import MGMCSampler


def force(v):
    return float(jnp.sum(v))


def main():
    sizes = tuple(int(a) for a in sys.argv[1:]) or (256, 512)
    for N in sizes:
        op = gmrf_3d(N, kappa=1.0, dtype=jnp.float32)
        smp = MGMCSampler.create(
            op, n_pre=1, n_post=0, coarsest_size=128, coarsening="aggregate"
        )

        # unsharded flagship step.  b rides as a jit ARGUMENT and the
        # state is DONATED: the round-4 probe closed over a zeros b
        # (multi-GB lowering constants) without donation and OOMed at
        # 1024^3.  Both sides stream the same explicit zeros b so the
        # ratio isolates the sharding machinery.
        def run_un(sampler, key, x, bb):
            def body(c, _):
                kk, xx = sampler.step(c[0], c[1], bb)
                return (kk, xx), None
            (key, x), _ = jax.lax.scan(body, (key, x), None, length=16)
            return x

        f_un = jax.jit(run_un, donate_argnums=(2,))
        x0 = jnp.zeros(op.grid_shape, jnp.float32)
        b0 = jnp.zeros(op.grid_shape, jnp.float32)
        x0 = f_un(smp, jax.random.PRNGKey(0), x0, b0)
        force(x0)
        t_un = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            x0 = f_un(smp, jax.random.PRNGKey(0), x0, b0)
            force(x0)
            t_un = min(t_un, (time.perf_counter() - t0) / 16)
        del x0, b0

        # sharded over a 1-device mesh: all machinery, no ICI
        mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
        step, sharding = make_sharded_mgmc_step(
            smp, mesh, min_local=8, with_noise=True
        )

        def run_sh(key, x, bb):
            def body(c, _):
                kk, xx = step(c[0], c[1], bb)
                return (kk, xx), None
            (key, x), _ = jax.lax.scan(body, (key, x), None, length=16)
            return x

        xs = jax.device_put(
            jnp.zeros(op.grid_shape, jnp.float32), sharding
        )
        bs = jax.device_put(
            jnp.zeros(op.grid_shape, jnp.float32), sharding
        )
        f_sh = jax.jit(run_sh, donate_argnums=(1,))
        xs = f_sh(jax.random.PRNGKey(0), xs, bs)
        force(xs)
        t_sh = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            xs = f_sh(jax.random.PRNGKey(0), xs, bs)
            force(xs)
            t_sh = min(t_sh, (time.perf_counter() - t0) / 16)
        del xs, bs

        print(
            f"{N}^3: unsharded {t_un*1e3:7.2f} ms/cycle   "
            f"sharded(1 dev) {t_sh*1e3:7.2f} ms/cycle   "
            f"machinery overhead {(t_sh-t_un)*1e3:+.2f} ms "
            f"({t_sh/t_un:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
