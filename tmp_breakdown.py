"""Scratch: 256^3 cycle-cost breakdown on the chip. Delete after use."""
import functools
import sys
import time

import jax
import jax.numpy as jnp

from parmgmc_tpu.chain import ChainState, sample_chain
from parmgmc_tpu.models.problems import gmrf_3d
from parmgmc_tpu.samplers.mgmc import MGMCSampler

N = 256
STEPS = 512


def force(v):
    return float(jnp.sum(v))


def timeit(name, run, *args):
    out = run(*args)
    force(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = run(*args)
    force(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name}: {dt:.3f} ms/step", flush=True)
    return dt


def main(which):
    op = gmrf_3d(N, kappa=1.0, dtype=jnp.float32)
    sampler = MGMCSampler.create(
        op, n_pre=1, n_post=0, coarsest_size=128, coarsening="aggregate"
    )
    b = jnp.zeros(op.grid_shape, jnp.float32)
    st = ChainState(x=jnp.zeros(op.grid_shape, jnp.float32), key=jax.random.PRNGKey(0))
    print("levels:", sampler.n_levels, [o.grid_shape for o in sampler.ops], flush=True)

    if which in ("full", "all"):
        run = jax.jit(
            lambda smp, s, bb: sample_chain(smp, s, bb, STEPS, extract=lambda x: jnp.mean(x))
        )
        timeit("full step + mean QOI", run, sampler, st, b)

    if which in ("noqoi", "all"):
        run = jax.jit(
            lambda smp, s, bb: sample_chain(smp, s, bb, STEPS, extract=lambda x: jnp.float32(0))
        )
        timeit("full step, no QOI", run, sampler, st, b)

    if which in ("parts", "all"):
        s0 = sampler.smoothers[0]
        from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_fd

        @jax.jit
        def run_chainonly(smp, x, bb):
            def body(x, i):
                xpy, rq = fused_chain_down_fd(
                    x, bb, smp.smoothers[0]._coeff6(),
                    smp.smoothers[0].fd_params[0], smp.smoothers[0].fd_params[1],
                    smp.smoothers[0].omega.astype(jnp.float32), i, i,
                )
                return xpy, jnp.sum(rq)
            return jax.lax.scan(body, x, jnp.arange(STEPS, dtype=jnp.int32))

        timeit("chain kernel only", run_chainonly, sampler, st.x, b)

        @jax.jit
        def run_tail(smp, x, bb):
            def body(carry, i):
                x, key = carry
                xpy, rc, key = smp._fused_chain_down(x, bb, key)
                key, sub = jax.random.split(key)
                z1 = smp._cycle_keyed(1, rc, sub)
                return (xpy, key), jnp.sum(z1)
            return jax.lax.scan(body, (x, jax.random.PRNGKey(0)), jnp.arange(STEPS))

        timeit("chain + tail (no prolong-add)", run_tail, sampler, st.x, b)

        @jax.jit
        def run_all(smp, x, bb):
            def body(carry, i):
                x, key = carry
                key2, x2 = smp.step(key, x, bb)
                return (x2, key2), jnp.float32(0)
            return jax.lax.scan(body, (x, jax.random.PRNGKey(0)), jnp.arange(STEPS))

        timeit("full step (manual scan)", run_all, sampler, st.x, b)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")


def extra(which):
    op = gmrf_3d(N, kappa=1.0, dtype=jnp.float32)
    b = jnp.zeros(op.grid_shape, jnp.float32)
    x0 = jnp.zeros(op.grid_shape, jnp.float32)
    if which == "nonoise":
        sampler = MGMCSampler.create(op, n_pre=1, n_post=0, coarsest_size=128, coarsening="aggregate")
        from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_fd
        s0 = sampler.smoothers[0]

        @jax.jit
        def run(smp, x, bb):
            def body(x, i):
                xpy, rq = fused_chain_down_fd(
                    x, bb, smp.smoothers[0]._coeff6(),
                    smp.smoothers[0].fd_params[0], smp.smoothers[0].fd_params[1],
                    smp.smoothers[0].omega.astype(jnp.float32), i, i,
                    with_noise=False,
                )
                return xpy, jnp.sum(rq)
            return jax.lax.scan(body, x, jnp.arange(STEPS, dtype=jnp.int32))
        timeit("chain kernel, with_noise=False", run, sampler, x0, b)
    elif which == "coarse1024":
        sampler = MGMCSampler.create(op, n_pre=1, n_post=0, coarsest_size=1024, coarsening="aggregate")
        print("levels:", [o.grid_shape for o in sampler.ops], flush=True)
        st = ChainState(x=x0, key=jax.random.PRNGKey(0))
        run = jax.jit(lambda smp, s, bb: sample_chain(smp, s, bb, STEPS, extract=lambda x: jnp.mean(x)))
        timeit("full step, coarsest 16^3 dense", run, sampler, st, b)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] in ("nonoise", "coarse1024"):
    extra(sys.argv[1])
