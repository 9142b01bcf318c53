"""Per-stage wall-clock breakdown of the flagship MGMC chain step.

Times each stage of the deferred-prolong agg-V(1,0) cycle separately
(scans of the stage alone, axon-fenced), so regressions and remaining
headroom are attributable.  Stages:

  full      : sample_chain_deferred step (the bench.py number)
  chain     : level-0 chain kernel alone (with zx2 + sums)
  l1        : level-1 fused down kernel alone (no glue)
  glue_rc   : the rq -> rc lane pair-sum XLA pass at level 0
  glue_zx2  : the z1 -> zx2 broadcast XLA pass
  tail      : everything below level 1 (_cycle_keyed at l=2), incl. the
              fused coarse tail, dense coarse sample and up adds
  up1       : level-1 up add y1 + P z2

--posterior (VERDICT r4 #4) instead decomposes the LRC deferred step
(bench.py --posterior, samplers/mgmc.py::step_deferred LRC branch) into
its component passes so the posterior-over-prior tax is attributable:

  full_prior : prior deferred step on the SAME hierarchy (the bench
               prior number at this size)
  full_post  : posterior (LRC) deferred step
  beff       : b_eff = b + B wv build (patch adds over a full-grid copy)
  chain_b    : level-0 chain kernel WITH the b stream (posterior mode)
  chain_nb   : level-0 chain kernel without b (prior mode) — the
               difference is the kernel-side b stream cost
  btx        : B^T xpy + B^T(P0 z) carry reads (patch windows)
  btx2       : B^T xpy2 (patch windows)
  bbsub      : x - Bb c windowed Woodbury apply
  rankk      : scalar rank-k glue (w draw, H@c, RABb tensordot,
               coarse-level B_c patch adds on rc)

Usage: [PROF_N=512] [PROF_STEPS=256] python examples/profile_cycle.py
       [PROF_N=256] python examples/profile_cycle.py --posterior
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(os.environ.get("PROF_N", "512"))
STEPS = int(os.environ.get("PROF_STEPS", "256"))


def force(v):
    return float(jnp.sum(v))


def timed(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: force(a) if hasattr(a, "shape") else a, out
    )
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: force(a) if hasattr(a, "shape") else a, out
    )
    return (time.perf_counter() - t0) / STEPS


def main():
    from parmgmc_tpu.chain import ChainState, sample_chain_deferred
    from parmgmc_tpu.models.problems import gmrf_3d
    from parmgmc_tpu.samplers.mgmc import MGMCSampler

    op = gmrf_3d(N, kappa=1.0, dtype=jnp.float32)
    smp = MGMCSampler.create(
        op, n_pre=1, n_post=0, coarsest_size=128, coarsening="aggregate"
    )
    b = jnp.zeros(op.grid_shape, jnp.float32)
    assert smp.deferred_eligible()
    n0, n1, n2 = op.grid_shape

    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros(op.grid_shape, jnp.float32)
    zx2_0 = smp.deferred_init(jnp.float32)

    # -- full step ---------------------------------------------------------
    @jax.jit
    def run_full(smp, st, bb):
        return sample_chain_deferred(smp, st, bb, STEPS)

    st = ChainState(x=x0, key=key)
    dt_full = timed(lambda: run_full(smp, st, b))

    # -- chain kernel alone (carry xpy; zx2 fixed) ---------------------------
    @jax.jit
    def run_chain(smp, x, z, bb):
        def body(c, i):
            xpy, acc = c
            k = jax.random.fold_in(key, i)
            xpy2, rc, _, xs, zs = smp._fused_chain_down(
                xpy, bb, k, z=z, with_xsum=True, with_zsum=True
            )
            return (
                xpy2,
                acc + jnp.sum(rc[0, 0]) + jnp.sum(xs) + jnp.sum(zs),
            ), 0.0

        (xpy, acc), _ = jax.lax.scan(
            body, (x, 0.0), jnp.arange(STEPS, dtype=jnp.int32)
        )
        return xpy, acc

    dt_chain = timed(lambda: run_chain(smp, x0, zx2_0, b))

    # -- level-1 down kernel alone ------------------------------------------
    rc0 = jnp.zeros((n0 // 2, n1 // 2, n2 // 2), jnp.float32)

    @jax.jit
    def run_l1(smp, r):
        def body(c, i):
            k = jax.random.fold_in(key, i)
            y, rcc, _ = smp._fused_down(1, c, k)
            return rcc.repeat(2, 0).repeat(2, 1).repeat(2, 2) + y * 0.01, 0.0

        r, _ = jax.lax.scan(body, r, jnp.arange(STEPS, dtype=jnp.int32))
        return r

    dt_l1 = timed(lambda: run_l1(smp, rc0)) if smp.n_levels > 2 else 0.0

    # -- glue: rq pair-sum and zx2 broadcast ---------------------------------
    rq0 = jnp.zeros((n0 // 2, n1 // 2, n2), jnp.float32)

    @jax.jit
    def run_rc(rq):
        def body(c, _):
            rc = c.reshape(n0 // 2, n1 // 2, n2 // 2, 2).sum(-1)
            return rc.repeat(2, 2) * 0.5, 0.0

        rq, _ = jax.lax.scan(body, rq, None, length=STEPS)
        return rq

    dt_rc = timed(lambda: run_rc(rq0))

    z1_0 = jnp.zeros((n0 // 2, n1 // 2, n2 // 2), jnp.float32)
    layout = smp.deferred_layout()

    @jax.jit
    def run_zx2(z1):
        def body(c, _):
            if layout == "zf":
                zn = jnp.broadcast_to(
                    c[:, :, None, :, None], (n0 // 2, n1 // 2, 2, n2 // 2, 2)
                ).reshape(n0 // 2, n1, n2)
                return zn[:, ::2, ::2] * 0.5, 0.0
            zn = jnp.broadcast_to(c[..., None], (*c.shape, 2)).reshape(
                n0 // 2, n1 // 2, n2
            )
            return zn[..., ::2] * 0.5, 0.0

        z1, _ = jax.lax.scan(body, z1, None, length=STEPS)
        return z1

    dt_zx2 = timed(lambda: run_zx2(z1_0))

    # -- tail: everything below level 1 --------------------------------------
    if smp.n_levels > 2:
        r2 = jnp.zeros(tuple(smp.ops[2].grid_shape), jnp.float32)

        @jax.jit
        def run_tail(smp, r):
            def body(c, i):
                k = jax.random.fold_in(key, i)
                z = smp._cycle_keyed(2, c, k)
                return z, 0.0

            r, _ = jax.lax.scan(body, r, jnp.arange(STEPS, dtype=jnp.int32))
            return r

        dt_tail = timed(lambda: run_tail(smp, r2))
    else:
        dt_tail = 0.0

    # -- level-1 up add -------------------------------------------------------
    y1 = jnp.zeros((n0 // 2, n1 // 2, n2 // 2), jnp.float32)
    z2 = jnp.zeros(tuple(smp.ops[2].grid_shape), jnp.float32)

    @jax.jit
    def run_up1(y, z):
        def body(c, _):
            out = y + smp.transfers[1].prolong(z + c)
            return jnp.sum(out[0, 0]) * 1e-30, 0.0

        acc, _ = jax.lax.scan(body, 0.0, None, length=STEPS)
        return acc

    dt_up1 = timed(lambda: run_up1(y1, z2)) if smp.n_levels > 2 else 0.0

    stages = {
        "full": dt_full,
        "chain": dt_chain,
        "l1": dt_l1,
        "glue_rc": dt_rc,
        "glue_zx2": dt_zx2,
        "tail(l2+)": dt_tail,
        "up1": dt_up1,
    }
    print(f"\n{N}^3 agg-V(1,0) deferred chain, {STEPS}-step scans:")
    for k, v in stages.items():
        print(f"  {k:10s} {v * 1e3:8.3f} ms/step")
    acc = sum(v for k, v in stages.items() if k != "full")
    print(f"  {'sum':10s} {acc * 1e3:8.3f} ms/step (vs full: "
          f"{dt_full * 1e3:.3f})")


def posterior_main():
    """Attribute the posterior-over-prior cycle tax (VERDICT r4 #4).

    Small rank-k stages are kept honest inside their scans by threading
    window-sized serial dependencies (patch adds / window reads) rather
    than full-grid perturbations, so each stage's wall clock reflects
    only its own HBM traffic + launch cost.
    """
    from parmgmc_tpu.chain import ChainState, sample_chain_deferred
    from parmgmc_tpu.models.problems import gmrf_3d
    from parmgmc_tpu.samplers.mgmc import MGMCSampler

    # mirror bench.py::_posterior_problem exactly (same seeds/coords)
    import numpy as np

    from parmgmc_tpu.models.obs import make_posterior_operator

    base = gmrf_3d(N, kappa=1.0, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    K = 5
    coords = 0.15 + 0.7 * rng.random((K, 3))
    op, b = make_posterior_operator(
        base, 0.01, coords, np.full(K, 0.12), obsvals=rng.standard_normal(K)
    )

    smp_pri = MGMCSampler.create(
        base, n_pre=1, n_post=0, coarsest_size=128, coarsening="aggregate"
    )
    smp = MGMCSampler.create(
        op, n_pre=1, n_post=0, coarsest_size=128, coarsening="aggregate"
    )
    assert smp._lrc_chain_eligible(), "posterior fused path not engaged"
    assert smp.deferred_eligible()
    s = smp.smoothers[0]
    op0 = smp.fine_op
    n0, n1, n2 = op.grid_shape
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros(op.grid_shape, jnp.float32)
    z0 = smp.deferred_init(jnp.float32)
    if isinstance(z0, tuple):  # posterior route carries (z, B^T x)
        z0 = z0[0]
    w0 = jnp.full((K,), 1e-3, jnp.float32)
    print(
        f"{N}^3 posterior k={K}: B patches "
        f"{None if op0.patch_vals is None else tuple(op0.patch_vals.shape)}, "
        f"Bb patches "
        f"{None if s.Bb_fw_pv is None else tuple(s.Bb_fw_pv.shape)}"
    )

    # -- full steps ---------------------------------------------------------
    @jax.jit
    def run_full(smp_, st, bb):
        return sample_chain_deferred(smp_, st, bb, STEPS)

    dt_pri = timed(lambda: run_full(smp_pri, ChainState(x=x0, key=key), None))
    dt_post = timed(lambda: run_full(smp, ChainState(x=x0, key=key), b))

    # -- b_eff build: patch adds over a full-grid copy ----------------------
    @jax.jit
    def run_beff(be):
        def body(c, _):
            return op0.b_apply_add(w0, c) * 0.999, 0.0

        be, _ = jax.lax.scan(body, be, None, length=STEPS)
        return be

    dt_beff = timed(lambda: run_beff(b))

    # -- chain kernel with / without the b stream ---------------------------
    def make_chain(with_b):
        @jax.jit
        def run(smp_, x, z, bb):
            def body(c, i):
                xpy, acc = c
                k = jax.random.fold_in(key, i)
                xpy2, rc, _, xs, zs = smp_._fused_chain_down(
                    xpy, bb, k, z=z, with_xsum=True, with_zsum=True
                )
                return (
                    xpy2,
                    acc + jnp.sum(rc[0, 0]) + jnp.sum(xs) + jnp.sum(zs),
                ), 0.0

            (xpy, acc), _ = jax.lax.scan(
                body, (x, 0.0), jnp.arange(STEPS, dtype=jnp.int32)
            )
            return xpy, acc

        return run

    run_cb = make_chain(True)
    run_cn = make_chain(False)
    dt_cb = timed(lambda: run_cb(smp, x0, z0, b))
    dt_cn = timed(lambda: run_cn(smp, x0, z0, None))

    # -- B^T reads (patch windows) ------------------------------------------
    @jax.jit
    def run_btx(x, z):
        def body(c, _):
            xc, zc = c
            t = op0.bt_apply(xc) + smp._bt_carry(zc)
            # window-sized serial dependence: fold t back into x's balls
            return (op0.b_apply_add(t * 1e-30, xc), zc), 0.0

        c, _ = jax.lax.scan(body, (x, z), None, length=STEPS)
        return c[0]

    dt_btx = timed(lambda: run_btx(x0, z0))

    @jax.jit
    def run_btx2(x):
        def body(c, _):
            t = op0.bt_apply(c)
            return op0.b_apply_add(t * 1e-30, c), 0.0

        c, _ = jax.lax.scan(body, x, None, length=STEPS)
        return c

    dt_btx2 = timed(lambda: run_btx2(x0))

    # -- windowed Woodbury apply x - Bb c -----------------------------------
    @jax.jit
    def run_bbsub(x):
        def body(c, _):
            t = op0.bt_apply(c) * 1e-30
            return s._bb_apply_sub(s.sweep, c, t), 0.0

        c, _ = jax.lax.scan(body, x, None, length=STEPS)
        return c

    dt_bbsub = timed(lambda: run_bbsub(x0))

    # -- rank-k glue: w draw, H@c, RABb tensordot, coarse B_c adds ----------
    rc0 = jnp.zeros((n0 // 2, n1 // 2, n2 // 2), jnp.float32)
    H = smp.lrc_aux["H"]
    RABb = smp.lrc_aux["RABb"]
    colsum = smp.lrc_aux["Bb_colsum"]

    @jax.jit
    def run_rankk(rc):
        def body(c, i):
            klr = jax.random.fold_in(key, i)
            w = s.sqrt_sigma_inv * jax.random.normal(klr, (K,), jnp.float32)
            cvec = smp.ops[1].bt_apply(c) * 1e-30 + w * 1e-30
            cc = w * 1e-30 + op0.sigma_inv * (cvec - H @ cvec)
            out = smp.ops[1].b_apply_add(
                -cc, c + jnp.tensordot(RABb, cvec, axes=((3,), (0,)))
            )
            sx = colsum @ cvec
            return out * 0.999 + sx * 1e-30, 0.0

        c, _ = jax.lax.scan(body, rc, jnp.arange(STEPS, dtype=jnp.int32))
        return c

    dt_rankk = timed(lambda: run_rankk(rc0))

    stages = {
        "full_prior": dt_pri,
        "full_post": dt_post,
        "beff": dt_beff,
        "chain_b": dt_cb,
        "chain_nb": dt_cn,
        "btx": dt_btx,
        "btx2": dt_btx2,
        "bbsub": dt_bbsub,
        "rankk": dt_rankk,
    }
    print(f"\n{N}^3 posterior k={K} deferred LRC chain, {STEPS}-step scans:")
    for kk, v in stages.items():
        print(f"  {kk:10s} {v * 1e3:8.3f} ms/step")
    tax = dt_post - dt_pri
    acc = (
        dt_beff
        + (dt_cb - dt_cn)
        + dt_btx
        + dt_btx2
        + dt_bbsub
        + dt_rankk
    )
    print(
        f"  posterior tax {tax * 1e3:.3f} ms/step; attributed "
        f"{acc * 1e3:.3f} (beff + [chain_b-chain_nb] + btx + btx2 + "
        f"bbsub + rankk)"
    )


if __name__ == "__main__":
    if "--posterior" in sys.argv:
        posterior_main()
    else:
        main()
