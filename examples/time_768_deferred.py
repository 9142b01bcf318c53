"""Time 768^3 MGMC cycles: standard step vs deferred (zf) chain.

The 2D-tiled chain kernel gained a zf lazy-carry input; this measures
whether deferring the fine prolong-add pays past the whole-plane window
(where the zx2 route never ran).  TPU-only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from parmgmc_tpu.chain import ChainState, sample_chain, sample_chain_deferred
from parmgmc_tpu.models.problems import gmrf_3d
from parmgmc_tpu.samplers.mgmc import MGMCSampler

N = 768
STEPS = 20


def force(x):
    return float(jax.tree_util.tree_reduce(
        lambda a, l: a + jnp.sum(l).astype(jnp.float64), x, 0.0
    ))


def main():
    op = gmrf_3d(N, kappa=1.0, dtype=jnp.float32)
    smp = MGMCSampler.create(
        op, n_pre=1, n_post=0, coarsest_size=128,
        coarsening="aggregate", impl="fused_fd",
    )
    print("deferred_eligible:", smp.deferred_eligible(),
          "layout:", smp.deferred_layout() if smp.deferred_eligible() else "-")
    b = jnp.zeros((N, N, N), jnp.float32)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((N, N, N), jnp.float32)

    @jax.jit
    def run_std(smp, st, b):
        st, q = sample_chain(smp, st, b, STEPS, extract=jnp.mean)
        return st.x.sum(), q

    @jax.jit
    def run_def(smp, st, b):
        st, q = sample_chain_deferred(smp, st, b, STEPS)
        return st.x.sum(), q

    st = ChainState(x=x0, key=key)
    for name, fn in (("std", run_std), ("deferred", run_def)):
        if name == "deferred" and not smp.deferred_eligible():
            print("deferred: ineligible, skipped")
            continue
        s, q = fn(smp, st, b)
        force((s, q))
        t0 = time.perf_counter()
        s, q = fn(smp, st, b)
        force((s, q))
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{name}: {dt * 1e3:.2f} ms/cycle  q[-1]={float(q[-1]):.6e}")


if __name__ == "__main__":
    main()
