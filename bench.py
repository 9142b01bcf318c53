"""Headline benchmark: ESS/sec on a 256^3 GMRF with MGMC V(2,2).

Mirrors the reference's benchmark harness semantics
(``/root/reference/examples/benchmark/main.cc``): time-per-sample from a
wall-clocked chain, IACT of a scalar QOI via the emcee-window estimator
(``src/iact.c``), and time-per-independent-sample = max(tau,1) * T / n.
We report ESS/sec = 1 / time-per-independent-sample.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against a 64-rank MPI CPU reference derived from a
MEASURED single-core re-timing of the reference's CSR SOR hot loop
(parmgmc_tpu/native/ref_sor_bench.cpp; reproduce with
examples/baseline_cpu_reference.py) scaled by a perfect-scaling model
that is generous to the reference — see BENCH_NOTES.md. The reference
itself publishes no numbers (BASELINE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("BENCH_N", "256"))
N_TIME = int(os.environ.get("BENCH_STEPS", "64"))
N_IACT = int(os.environ.get("BENCH_IACT_STEPS", "2048"))
DTYPE = jnp.float32

# Measured anchor (2026-08-16, this host): the reference's CSR red/black
# SOR sweep runs at 49.5 MDOF/s/core at 128^3 (out of cache), i.e.
# ~5 GB/s/core effective at ~100 B/DOF — matching typical per-rank HPC
# bandwidth.  64 ranks, perfect scaling, free RNG, V(1,0) at 2.57
# fine-sweep-equivalents/cycle, matched tau=1.07 -> ~69 ESS/sec; rounded
# UP in the reference's favour.  Model + measurement: BENCH_NOTES.md.
BASELINE_ESS_PER_SEC = 70.0


def main():
    from parmgmc_tpu.chain import ChainState, sample_chain
    from parmgmc_tpu.models.problems import gmrf_3d
    from parmgmc_tpu.samplers.mgmc import MGMCSampler

    # Best measured config (sweep in BENCH_NOTES.md): plain-aggregation
    # hierarchy (star stencils at every level -> fused Pallas sweeps with
    # on-chip noise), V(1,0) cycles (tau ~= 1.07), deep coarsening.
    op = gmrf_3d(N, kappa=1.0, dtype=DTYPE)
    sampler = MGMCSampler.create(
        op, n_pre=1, n_post=0, coarsest_size=128, coarsening="aggregate"
    )
    b = jnp.zeros(op.grid_shape, DTYPE)
    qoi = lambda x: jnp.mean(x)

    # Pass sampler + b as jit ARGUMENTS: closing over them would embed the
    # operator hierarchy (hundreds of MB at 256^3) as program constants.
    run_time = jax.jit(
        lambda smp, s, bb: sample_chain(smp, s, bb, N_TIME, extract=qoi)
    )
    run_iact = jax.jit(
        lambda smp, s, bb: sample_chain(smp, s, bb, N_IACT, extract=qoi)
    )

    st = ChainState(
        x=jnp.zeros(op.grid_shape, DTYPE), key=jax.random.PRNGKey(0)
    )

    def force(v):
        # axon's block_until_ready returns before remote execution finishes;
        # a scalar reduction + host transfer is the reliable fence.
        return float(jnp.sum(v))

    # Warm-up: compile both programs and advance past the transient.
    st, _ = run_time(sampler, st, b)
    force(st.x)

    t0 = time.perf_counter()
    st, _ = run_time(sampler, st, b)
    force(st.x)
    dt = (time.perf_counter() - t0) / N_TIME  # seconds per V(2,2) sample

    st, q = run_iact(sampler, st, b)
    q = np.asarray(q)

    from parmgmc_tpu.diagnostics.iact import iact

    tau, valid = iact(q)
    tau = max(float(tau), 1.0)
    ess_per_sec = 1.0 / (tau * dt)

    print(
        json.dumps(
            {
                "metric": f"ESS/sec, {N}^3 GMRF, MGMC agg-V(1,0) chain, f32, 1 chip"
                + ("" if valid else " (IACT window short)"),
                "value": round(ess_per_sec, 2),
                "unit": "ESS/sec",
                "vs_baseline": round(ess_per_sec / BASELINE_ESS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
