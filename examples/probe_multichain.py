"""Do vmapped deferred MGMC chains amortize per-step overhead?

At 256^3 the cycle is ~1.17 ms with the chain kernel's DMA floor near
~0.6 ms — the rest is VPU passes, XLA glue and per-kernel dispatch.
If C vmapped chains cost less than C times one chain, aggregate
ESS/sec (the throughput a multi-chain study like ex6/ex7 sees) rises
accordingly: tau is a property of each independent chain, so total
ESS/sec = C / (tau * dt_per_step_of_the_batch).

Run on TPU: [PROBE_N=256] [PROBE_CHAINS="1 2 4"] python
examples/probe_multichain.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(os.environ.get("PROBE_N", "256"))
STEPS = int(os.environ.get("PROBE_STEPS", "128"))
CHAINS = tuple(
    int(c) for c in os.environ.get("PROBE_CHAINS", "1 2 4").split()
)


def main():
    from parmgmc_tpu.chain import ChainState, sample_chain_deferred
    from parmgmc_tpu.models.problems import gmrf_3d
    from parmgmc_tpu.samplers.mgmc import MGMCSampler

    op = gmrf_3d(N, kappa=1.0, dtype=jnp.float32)
    smp = MGMCSampler.create(
        op, n_pre=1, n_post=0, coarsest_size=128, coarsening="aggregate"
    )
    assert smp.deferred_eligible()
    b = None

    for c in CHAINS:
        keys = jax.random.split(jax.random.PRNGKey(0), c)
        xs = jnp.zeros((c, *op.grid_shape), jnp.float32)

        @jax.jit
        def run(smp, xs, keys):
            def one(x0, k):
                st = ChainState(x=x0, key=k)
                st2, q = sample_chain_deferred(smp, st, b, STEPS)
                return st2.x, q

            return jax.vmap(one, in_axes=(0, 0))(xs, keys)

        try:
            out, q = run(smp, xs, keys)
            float(jnp.sum(out))
            t0 = time.perf_counter()
            out, q = run(smp, xs, keys)
            float(jnp.sum(out))
            dt = (time.perf_counter() - t0) / STEPS * 1e3
            print(
                f"  {c} chains: {dt:7.3f} ms/step batch, "
                f"{dt / c:7.3f} ms/chain-step "
                f"({1000.0 / dt * c:8.1f} chain-steps/s total)"
            )
        except Exception as e:
            print(f"  {c} chains: {type(e).__name__}: {e}")
            break


if __name__ == "__main__":
    main()
