"""Configurable Matérn benchmark driver (the benchmark/ harness analogue).

Reference: /root/reference/examples/benchmark/main.cc + benchmarkrc /
wrench.opts: burn-in + sampling phases over a Gmsh-mesh Matérn problem
(optionally with low-rank observations), Welford mean/var, and the three
headline prints — time per sample, IACT of a QOI, time per independent
sample (max(tau,1) * T / n).

    python examples/benchmark_matern.py --mesh /root/reference/data/wrench.msh \
        --refine 1 --kappa 5 --burnin 1000 --samples 10000 --posterior
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from parmgmc_tpu.chain import sample_chain, sample_moments
from parmgmc_tpu.diagnostics.iact import iact
from parmgmc_tpu.models.matern import MaternMeshSampler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="/root/reference/data/wrench.msh")
    ap.add_argument("--refine", type=int, default=0)
    ap.add_argument("--kappa", type=float, default=5.0)
    ap.add_argument("--burnin", type=int, default=1000)
    ap.add_argument("--samples", type=int, default=10000)
    ap.add_argument("--posterior", action="store_true")
    ap.add_argument("--sigma2", type=float, default=2.5e-3)
    ap.add_argument("--dtype", default="f64", choices=["f32", "f64"])
    ap.add_argument("--order", type=int, default=1, choices=[1, 2],
                    help="FE order (2 = CG2, the reference ex13 space)")
    ap.add_argument("--hierarchy", default="algebraic",
                    choices=["algebraic", "geometric"],
                    help="geometric needs --refine >= 1 and order 1")
    args = ap.parse_args()

    obs = None
    if args.posterior:
        obs = dict(
            sigma2=args.sigma2,
            coords=[[0, 125, 0], [30, 35, 0], [-15, 100, 0]],
            radii=[10.0, 10.0, 10.0],
            values=[1.0, -1.0, 2.0],
        )
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    ms = MaternMeshSampler(
        mesh_file=args.mesh,
        kappa=args.kappa,
        refinements=args.refine,
        dtype=dtype,
        observations=obs,
        coarsest_size=128,
        order=args.order,
        hierarchy=args.hierarchy,
    )
    print(f"DOFs: {ms.n}   levels: {ms.sampler.n_levels}")
    ms.set_qoi(lambda x: jnp.mean(x))

    # burn-in
    ms.sample(args.burnin)

    t0 = time.perf_counter()
    q = np.asarray(ms.sample(args.samples))
    wall = time.perf_counter() - t0

    tau, valid = iact(q)
    tau = max(float(tau), 1.0)
    tps = wall / args.samples * 1000
    print(f"Time per sample [ms]: {tps:.4f}")
    print(f"IACT: {tau:.3f}{'' if valid else ' (window short)'}")
    print(f"Time per independent sample [ms]: {tau * tps:.4f}")


if __name__ == "__main__":
    main()
