"""Exactness of the LRC (posterior) fused-kernel routing ALGEBRA.

The fused kernels themselves cannot run on CPU (Mosaic/TPU only), but
everything NEW on the posterior path is rank-k algebra AROUND the kernel
call (samplers/gibbs.py::_fused_step LRC branch, samplers/mgmc.py::
_lrc_chain_step).  These tests substitute a lax-equivalent stand-in for
the kernel invocation and check the surrounding algebra against the
materialised oracle (explicit LRC residuals, explicit Woodbury
correction) to floating-point roundoff.  The same A/B runs against the
REAL kernels on hardware via ``python bench.py --selftest-lrc``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parmgmc_tpu.models.obs import make_observation_mats
from parmgmc_tpu.operators.lrc import LRCOperator
from parmgmc_tpu.operators.stencil import shifted_laplace_fd
from parmgmc_tpu.samplers.gibbs import GibbsSampler
from parmgmc_tpu.samplers.mgmc import MGMCSampler
from parmgmc_tpu.samplers.sor import sor_sweep

GRID = (8, 16, 128)  # kernel-eligible shape (lane dim % 128)


def make_posterior(k=3, dtype=jnp.float32, patches=True):
    from parmgmc_tpu.operators.lrc import with_patches

    base = shifted_laplace_fd(GRID, 1.0, dtype=dtype)
    coords = np.array(
        [[0.3, 0.4, 0.5], [0.6, 0.3, 0.2], [0.5, 0.7, 0.8]][:k]
    )
    B, sigma_inv, f = make_observation_mats(
        GRID, 0.1, coords, np.full(k, 0.15), obsvals=np.ones(k), dtype=dtype
    )
    op = LRCOperator(base=base, B=B, sigma_inv=sigma_inv)
    return (with_patches(op) if patches else op), f


def test_patch_products_match_dense():
    """The sparse patch view's B^T x / B w / y + B w equal the dense
    contractions (up to fp summation order)."""
    op, _ = make_posterior()
    assert op.patch_vals is not None, "ball columns should patchify"
    dense = LRCOperator(base=op.base, B=op.B, sigma_inv=op.sigma_inv)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, GRID, jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (op.k,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(op.bt_apply(x)), np.asarray(dense.bt_apply(x)), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(op.b_apply(w)), np.asarray(dense.b_apply(w)),
        atol=1e-6 * float(jnp.abs(dense.b_apply(w)).max()),
    )
    np.testing.assert_allclose(
        np.asarray(op.b_apply_add(w, x)),
        np.asarray(x + dense.b_apply(w)),
        atol=2e-5 * float(jnp.abs(x).max()),
    )


def _fake_sweep(x, b, coeffs, kappa2, hinv2, omega, seed, step, sweep="forward", **kw):
    """Deterministic stand-in for fused_rb_gibbs_sweep_fd: the same SOR
    iteration with the noise disabled (the kernel's sweep is the
    parity-mask sweep; see tests/test_kernels.py for that equivalence)."""
    op = shifted_laplace_fd(GRID, 1.0, dtype=x.dtype)
    return sor_sweep(op, b, x, jnp.asarray(omega, x.dtype), sweep)


def test_fused_patch_apply_add_matches_sequential():
    """The m-set union-window apply equals m sequential single-set
    applies on the same windows (round-5 launch-count optimization)."""
    from parmgmc_tpu.operators.lrc import (
        fused_patch_apply_add,
        patch_apply_add,
    )

    rng = np.random.default_rng(3)
    shape = (12, 14, 16)
    m, k, box = 3, 4, (5, 6, 4)
    pv = jnp.asarray(rng.standard_normal((m, k, *box)), jnp.float32)
    ps = jnp.asarray(
        np.stack(
            [
                rng.integers(0, shape[a] - box[a], size=k)
                for a in range(3)
            ],
            axis=1,
        ).astype(np.int32)
    )
    w = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    got = fused_patch_apply_add(pv, ps, w, y)
    want = y
    # same window order per j: apply all m sets window-by-window
    for j in range(k):
        upd = sum(pv[i, j] * w[i, j] for i in range(m))
        st = tuple(int(s) for s in ps[j])
        win = jax.lax.dynamic_slice(want, st, box)
        want = jax.lax.dynamic_update_slice(want, win + upd, st)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-6
    )
    # and one set reduces to patch_apply_add exactly
    np.testing.assert_allclose(
        np.asarray(fused_patch_apply_add(pv[:1], ps, w[:1], y)),
        np.asarray(patch_apply_add(pv[0], ps, w[0], y)),
        atol=2e-6,
    )


@pytest.mark.parametrize("sweep", ["forward", "symmetric"])
def test_gibbs_fused_lrc_algebra(monkeypatch, sweep):
    """GibbsSampler._fused_step LRC branch == lax _half_step chain with
    the same low-rank draws and zero field noise."""
    from parmgmc_tpu.kernels import rb_gibbs

    monkeypatch.setattr(rb_gibbs, "fused_rb_gibbs_sweep_fd", _fake_sweep)

    op, f = make_posterior()
    smp = GibbsSampler.create(op, omega=1.0, sweep=sweep, impl="fused_fd")
    assert smp.impl == "fused_fd" and smp.is_lrc

    key = jax.random.PRNGKey(11)
    x0 = jax.random.normal(jax.random.fold_in(key, 9), GRID, jnp.float32)
    _, got = smp.step(key, x0, f)

    # replicate the step's key consumption to recover the low-rank draws
    dirs = ["forward", "backward"] if sweep == "symmetric" else [sweep]
    k2, _, _ = jax.random.split(key, 3)  # key after seed/extra splits
    k2, klr = jax.random.split(k2)
    w_all = smp.sqrt_sigma_inv * jax.random.normal(
        klr, (len(dirs), op.k), jnp.float32
    )
    x = x0
    for i, d in enumerate(dirs):
        b_eff = f + op.b_apply(w_all[i])
        x = _fake_sweep(x, b_eff, None, None, None, 1.0, 0, 0, sweep=d)
        Bb = smp.Bb_fw if d == "forward" else smp.Bb_bw
        x = x - jnp.tensordot(Bb, op.bt_apply(x), axes=((3,), (0,)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=2e-5)


def _fake_chain_down(self, x, b, key, z=None, with_xsum=False, with_zsum=False):
    """lax stand-in for the fused chain-down kernel with the SAME
    contract: xpy = x + (one stochastic pre-sweep of r = b - A x from
    zero), rc = restrict(r - A y); a lazy carry ``z`` (zx2 layout) is
    expanded and folded into the state first, and the optional
    xsum/zsum outputs mirror the kernel's sum semantics (scalars here —
    the callers only ever jnp.sum them).  Uses threefry noise keyed off
    the same key the kernel path would consume, so the oracle and the
    routed step see identical draws."""
    s = self.smoothers[0]
    if z is not None:
        n0, n1, n2 = self.grid_shape
        zfull = jnp.broadcast_to(
            z[:, None, :, None, :], (n0 // 2, 2, n1 // 2, 2, n2)
        ).reshape(n0, n1, n2)
        x = x + zfull
    key, sub = jax.random.split(key)
    eta = jax.random.normal(sub, x.shape, x.dtype)
    bz = -s.base.apply(x) if b is None else b - s.base.apply(x)
    btilde = bz + s.noise_scale * eta
    y = sor_sweep(s.base, btilde, jnp.zeros_like(x), s.omega, s.sweep)
    rc = self.transfers[0].restrict(bz - s.base.apply(y))
    out = [x + y, rc, key]
    if with_xsum:
        out.append(jnp.sum(x + y))
    if with_zsum:
        out.append(jnp.sum(z) if z is not None else jnp.zeros((), x.dtype))
    return tuple(out)


def test_mgmc_lrc_chain_algebra(monkeypatch):
    """MGMCSampler._lrc_chain_step's rank-k residual/state corrections
    == the materialised oracle (explicit Woodbury + explicit LRC
    residual + restrict), with identical stochastic draws."""
    monkeypatch.setattr(MGMCSampler, "_fused_chain_down", _fake_chain_down)

    op, f = make_posterior()
    smp = MGMCSampler.create(
        op, n_pre=1, n_post=0, coarsest_size=128,
        coarsening="aggregate", impl="fused_fd",
    )
    assert smp.lrc_aux is not None
    assert smp._lrc_chain_eligible()

    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(jax.random.fold_in(key, 1), GRID, jnp.float32)

    for b in (f, None):
        _, got = smp.step(key, x0, b)

        # oracle: same keys, same fake kernel, materialised algebra
        _, sub = jax.random.split(key)
        sub, klr = jax.random.split(sub)
        s = smp.smoothers[0]
        w = s.sqrt_sigma_inv * jax.random.normal(klr, (op.k,), jnp.float32)
        btx = op.bt_apply(x0)
        b_eff = op.b_apply(w - op.sigma_inv * btx)
        if b is not None:
            b_eff = b_eff + b
        xpy, _rc_raw, sub = _fake_chain_down(smp, x0, b_eff, sub)
        y_raw = xpy - x0
        Bb = s.Bb_fw
        x_sm = xpy - jnp.tensordot(
            Bb, op.bt_apply(y_raw), axes=((3,), (0,))
        )
        bz = jnp.zeros_like(x0) if b is None else b
        rc_true = smp.transfers[0].restrict(bz - op.apply(x_sm - x0) - op.apply(x0))
        sub, sub2 = jax.random.split(sub)
        z1 = smp._cycle_keyed(1, rc_true, sub2)
        want = x_sm + smp.transfers[0].prolong(z1)

        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4,
            err_msg=f"b={'f' if b is not None else 'None'}",
        )


def test_mgmc_lrc_deferred_matches_step(monkeypatch):
    """The deferred-prolong LRC chain must reproduce the materialising
    LRC chain: same samples (to fp order) and the same mean-QOI stream
    assembled from the kernel sums + Woodbury colsum correction."""
    monkeypatch.setattr(MGMCSampler, "_fused_chain_down", _fake_chain_down)

    op, f = make_posterior()
    smp = MGMCSampler.create(
        op, n_pre=1, n_post=0, coarsest_size=128,
        coarsening="aggregate", impl="fused_fd",
    )
    assert smp.deferred_eligible()
    assert smp.deferred_layout() == "zx2"

    from parmgmc_tpu.chain import ChainState, sample_chain, sample_chain_deferred

    st = ChainState(x=jnp.zeros(GRID, jnp.float32), key=jax.random.PRNGKey(4))
    for b in (f, None):
        sta, qa = sample_chain(smp, st, b, 6, extract=jnp.mean)
        stb, qb = sample_chain_deferred(smp, st, b, 6)
        scale = float(jnp.abs(sta.x).max())
        np.testing.assert_allclose(
            np.asarray(stb.x), np.asarray(sta.x), atol=3e-4 * scale,
            err_msg="deferred LRC state diverged",
        )
        np.testing.assert_allclose(
            np.asarray(qb), np.asarray(qa), atol=1e-6 + 3e-4 * float(jnp.abs(qa).max()),
            err_msg="deferred LRC QOI stream diverged",
        )


def test_mgmc_lrc_b_response_matches_legacy(monkeypatch):
    """Round-5 kernel-probed b-response route (attach_chain_b_response:
    static b through the kernel + rank-k window corrections) must equal
    the legacy b_eff route under the same keys — step AND deferred step,
    with and without a static b."""
    import dataclasses

    monkeypatch.setattr(MGMCSampler, "_fused_chain_down", _fake_chain_down)

    op, f = make_posterior()
    smp = MGMCSampler.create(
        op, n_pre=1, n_post=0, coarsest_size=128,
        coarsening="aggregate", impl="fused_fd",
    )
    assert "Mb_pv" in smp.lrc_aux, "probe route should engage"
    legacy = dataclasses.replace(
        smp,
        lrc_aux={
            kk: smp.lrc_aux[kk] for kk in ("H", "RABb", "Bb_colsum")
        },
    )

    key = jax.random.PRNGKey(21)
    x0 = jax.random.normal(jax.random.fold_in(key, 2), GRID, jnp.float32)
    z0 = smp.deferred_init(jnp.float32, x0)  # (z, B^T x0) pair
    assert isinstance(z0, tuple), "posterior route should carry btxf"
    z0_legacy = legacy.deferred_init(jnp.float32, x0)
    assert not isinstance(z0_legacy, tuple)
    for b in (f, None):
        _, a = smp.step(key, x0, b)
        _, c = legacy.step(key, x0, b)
        scale = float(jnp.abs(c).max())
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=2e-4 * scale,
            err_msg=f"step b={'f' if b is not None else 'None'}",
        )
        ra = smp.step_deferred(key, x0, z0, b)
        rb = legacy.step_deferred(key, x0, z0_legacy, b)
        for va, vb, name in (
            (ra[1], rb[1], "xpy"),
            (ra[2][0], rb[2], "carry"),
            (ra[3], rb[3], "xsum"),
            (ra[4], rb[4], "zsum"),
        ):
            s2 = float(jnp.abs(vb).max()) + 1e-12
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), atol=3e-4 * s2,
                err_msg=f"deferred {name} "
                        f"b={'f' if b is not None else 'None'}",
            )


def test_mgmc_lrc_posterior_moments(monkeypatch):
    """End-to-end: the routed LRC chain (fake kernel) targets the dense
    posterior N(A_post^{-1} f, A_post^{-1}) — mean via long chain."""
    monkeypatch.setattr(MGMCSampler, "_fused_chain_down", _fake_chain_down)

    op, f = make_posterior()
    smp = MGMCSampler.create(
        op, n_pre=1, n_post=0, coarsest_size=128,
        coarsening="aggregate", impl="fused_fd",
    )
    assert smp._lrc_chain_eligible()

    from parmgmc_tpu.chain import ChainState, sample_moments

    n = 3000
    run = jax.jit(
        lambda smp, st, bb: sample_moments(smp, st, bb, n, burnin=50)
    )
    st = ChainState(
        x=jnp.zeros(GRID, jnp.float32), key=jax.random.PRNGKey(17)
    )
    _, mean, var = run(smp, st, f)

    A = np.asarray(op.to_dense(), dtype=np.float64)
    mu = np.linalg.solve(A, np.asarray(f, np.float64).reshape(-1))
    se = np.sqrt(np.asarray(var).reshape(-1) / n)
    z = np.abs(np.asarray(mean).reshape(-1) - mu) / np.maximum(se, 1e-12)
    # max over 16k points of approximately-normal errors with chain
    # autocorrelation inflation; a wrong posterior fails by orders
    assert z.max() < 10.0, z.max()
    assert z.mean() < 2.5, z.mean()
