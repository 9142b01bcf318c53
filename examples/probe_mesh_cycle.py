"""Per-phase timing of the multichain mesh MGMC cycle (round 4).

Times each component of the wrench refine-3 V(1,0) cycle at 256
chain-major chains to find where the ~21 ms (prior) / ~36 ms
(posterior) per-step wall goes: level sweeps, residual matvecs,
transfers, coarse solve, LRC corrections.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from parmgmc_tpu.models.matern import MaternMeshSampler

C = int(os.environ.get("PROBE_CHAINS", "256"))
POSTERIOR = bool(int(os.environ.get("PROBE_POSTERIOR", "0")))


def force(v):
    return float(jnp.sum(v))


def time_fn(fn, *args, reps=5, inner=8):
    """Median of reps timings of `inner` chained applications."""
    out = fn(*args)
    force(out if isinstance(out, jax.Array) else out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out if isinstance(out, jax.Array) else out[0])
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts))


def chained(f):
    """jit of 8 chained applications to amortize dispatch."""
    def run(op, X):
        def body(x, _):
            return f(op, x), None
        X, _ = jax.lax.scan(body, X, None, length=8)
        return X
    return jax.jit(run)


def main():
    obs = None
    if POSTERIOR:
        obs = dict(
            sigma2=1e-6,
            coords=[[0, 240, 0], [0, 130, 0], [15, -8, 0]],
            radii=[20, 8, 15],
            values=[1, -1, 1],
        )
    ms = MaternMeshSampler(
        mesh_file="/root/reference/data/wrench.msh",
        kappa=5.0,
        refinements=3,
        dtype=jnp.float32,
        coarsest_size=128,
        observations=obs,
    )
    mg = ms.sampler
    print(f"n={ms.n} levels={mg.n_levels} posterior={POSTERIOR} chains={C}")
    rng = np.random.default_rng(0)

    total = 0.0
    for l in range(mg.n_levels - 1):
        op = mg.ops[l]
        base = op.base if hasattr(op, "base") else op
        n = base.n
        X = jnp.asarray(rng.standard_normal((n, C)), jnp.float32)
        t_sw = time_fn(
            chained(lambda o, x: o.base.sor_sweep(
                jnp.zeros_like(x), x, jnp.float32(1.0), "forward")
                if hasattr(o, "base") else o.sor_sweep(
                jnp.zeros_like(x), x, jnp.float32(1.0), "forward")), op, X)
        t_mv = time_fn(chained(lambda o, x: o.apply(x) * 1e-3), op, X)
        print(f"level {l} (n={n}): sweep {t_sw*1e3:7.3f} ms  "
              f"apply {t_mv*1e3:7.3f} ms")
        total += t_sw + t_mv
        tr = mg.transfers[l]
        t_pair = time_fn(
            chained(lambda t, x: t.prolong(t.restrict(x)) * 1e-3), tr, X
        )
        print(f"  transfer {l}: restrict+prolong pair {t_pair*1e3:7.3f} ms")
        total += t_pair
        if hasattr(op, "base"):  # LRC level: rank-k residual extra
            t_base = time_fn(
                chained(lambda o, x: o.base.apply(x) * 1e-3), op, X)
            print(f"  lrc {l}: full apply - base apply = "
                  f"{(t_mv - t_base)*1e3:7.3f} ms extra")

    # coarse solve
    nco = mg.ops[-1].grid_shape[0] if not hasattr(mg.ops[-1], "base") else mg.ops[-1].base.n
    Xco = jnp.asarray(rng.standard_normal((nco, C)), jnp.float32)
    co = mg.coarse

    def coarse_step(smp, bl):
        eta = jnp.zeros((smp.n,) + bl.shape[1:], bl.dtype)
        return smp.step_with_noise(None, bl, [{"eta": eta}])

    t_co = time_fn(chained(lambda s, x: coarse_step(s, x)), co, Xco)
    print(f"coarse (n={nco}): {t_co*1e3:7.3f} ms")
    total += t_co

    # noise draw at level 0
    n0 = ms.n
    key = jax.random.PRNGKey(0)

    def draw(k, x):
        def body(c, _):
            kk, sub = jax.random.split(c)
            return kk, jax.random.normal(sub, x.shape, x.dtype)
        k2, es = jax.lax.scan(body, k, None, length=8)
        return es[-1]

    X0 = jnp.zeros((n0, C), jnp.float32)
    f_draw = jax.jit(draw)
    t_nz = time_fn(f_draw, key, X0)
    print(f"level-0 noise draw: {t_nz*1e3:7.3f} ms")

    # full keyed step
    f_step = jax.jit(lambda smp, k, x: smp.step(k, x, None)[1])
    from functools import partial

    def step8(smp, k, x):
        def body(c, _):
            kk, xx = smp.step(c[0], c[1], None)
            return (kk, xx), None
        (k, x), _ = jax.lax.scan(body, (k, x), None, length=8)
        return x

    f8 = jax.jit(step8)
    t_full = time_fn(f8, mg, key, X0)
    print(f"FULL step: {t_full*1e3:7.3f} ms   (sum of parts ~{(total+t_nz)*1e3:.1f})")


mg_dummy = 0
if __name__ == "__main__":
    main()
