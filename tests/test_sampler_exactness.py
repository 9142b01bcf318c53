"""Machine-precision distribution-invariance tests for every sampler.

Each sampler's one-step transition x' = G x + K eta + h must satisfy the
Gaussian fixed-point identities (see parmgmc_tpu.testing).  These replace
"runs 10^6 samples and checks the mean" with exact algebra on small
grids; statistical end-to-end tests live in the other test files.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parmgmc_tpu.operators.lrc import LRCOperator
from parmgmc_tpu.operators.stencil import galerkin_coarse_operator, shifted_laplace_fd
from parmgmc_tpu.samplers.cholesky import CholeskySampler
from parmgmc_tpu.samplers.gibbs import GibbsSampler
from parmgmc_tpu.samplers.mgmc import MGMCSampler
from parmgmc_tpu.testing import invariance_error

GRID = (5, 5)
TOL = 1e-10


def make_op(dtype=jnp.float64):
    return shifted_laplace_fd(GRID, 1.5, dtype=dtype)


def make_lrc(dtype=jnp.float64, k=3):
    base = make_op(dtype)
    key = jax.random.PRNGKey(42)
    B = jax.random.normal(key, (*GRID, k), dtype=dtype)
    sigma_inv = jnp.asarray([2.0, 0.5, 1.3], dtype=dtype)
    return LRCOperator(base=base, B=B, sigma_inv=sigma_inv)


def rhs(dtype=jnp.float64):
    return jnp.sin(jnp.arange(25, dtype=dtype)).reshape(GRID)


@pytest.mark.parametrize("sweep", ["forward", "backward", "symmetric"])
@pytest.mark.parametrize("omega", [1.0, 1.4])
def test_gibbs_invariance(sweep, omega):
    op = make_op()
    smp = GibbsSampler.create(op, omega=omega, sweep=sweep)
    mean_err, cov_err = invariance_error(smp, op, rhs())
    assert mean_err < TOL, f"mean fixed point violated: {mean_err}"
    assert cov_err < TOL, f"cov fixed point violated: {cov_err}"


@pytest.mark.parametrize("sweep", ["forward", "symmetric"])
def test_gibbs_lrc_invariance(sweep):
    """Gibbs on A + B Sigma^{-1} B^T: base sweep + extra noise + Woodbury
    post-correction must leave the posterior Gaussian invariant."""
    op = make_lrc()
    smp = GibbsSampler.create(op, omega=1.0, sweep=sweep)
    mean_err, cov_err = invariance_error(smp, op, rhs())
    assert mean_err < TOL, f"mean fixed point violated: {mean_err}"
    assert cov_err < TOL, f"cov fixed point violated: {cov_err}"


def test_cholesky_invariance():
    op = make_op()
    smp = CholeskySampler.create(op)
    mean_err, cov_err = invariance_error(smp, op, rhs())
    assert mean_err < TOL and cov_err < TOL


def test_cholesky_lrc_invariance():
    op = make_lrc()
    smp = CholeskySampler.create(op)
    mean_err, cov_err = invariance_error(smp, op, rhs())
    assert mean_err < TOL and cov_err < TOL


def test_mgmc_invariance():
    op = make_op()
    smp = MGMCSampler.create(op, n_levels=2, n_pre=1, n_post=1)
    mean_err, cov_err = invariance_error(smp, op, rhs())
    assert mean_err < TOL, f"mean fixed point violated: {mean_err}"
    assert cov_err < TOL, f"cov fixed point violated: {cov_err}"


def test_mgmc_zero_rhs_invariance():
    """b=None (the prior-sampling contract: samplers treat a missing RHS
    as exactly zero) must leave N(0, A^{-1}) invariant — this probes the
    b=None branch of step_with_noise itself."""
    op = make_op()
    smp = MGMCSampler.create(op, n_levels=2, n_pre=1, n_post=1)
    mean_err, cov_err = invariance_error(smp, op, None)
    assert mean_err < TOL and cov_err < TOL


def test_mgmc_v22_invariance():
    op = make_op()
    smp = MGMCSampler.create(op, n_levels=2, n_pre=2, n_post=2, sweep="symmetric")
    mean_err, cov_err = invariance_error(smp, op, rhs())
    assert mean_err < TOL and cov_err < TOL


def test_mgmc_lrc_invariance():
    """LRC hierarchy: B_c = P^T B_f per level + LRC-consistent residuals."""
    op = make_lrc()
    smp = MGMCSampler.create(op, n_levels=2)
    mean_err, cov_err = invariance_error(smp, op, rhs())
    assert mean_err < TOL, f"mean fixed point violated: {mean_err}"
    assert cov_err < TOL, f"cov fixed point violated: {cov_err}"


def test_sweep_equivalence():
    """Symmetric sweep == forward then backward with the same draws (ex5)."""
    op = make_op()
    sym = GibbsSampler.create(op, omega=1.2, sweep="symmetric")
    fwd = GibbsSampler.create(op, omega=1.2, sweep="forward")
    bwd = GibbsSampler.create(op, omega=1.2, sweep="backward")
    b = rhs()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, GRID, dtype=jnp.float64)
    k1, k2 = jax.random.split(key)
    n1 = {"eta": jax.random.normal(k1, GRID, dtype=jnp.float64)}
    n2 = {"eta": jax.random.normal(k2, GRID, dtype=jnp.float64)}
    y_sym = sym.step_with_noise(x, b, [n1, n2])
    y_fb = bwd.step_with_noise(fwd.step_with_noise(x, b, [n1]), b, [n2])
    np.testing.assert_allclose(np.asarray(y_sym), np.asarray(y_fb), atol=1e-14)


def test_gibbs_iteration_operator_identity():
    """The deterministic sweep's M satisfies M + M^T - A = (2-w)/w D, the
    algebraic identity that makes Gibbs-as-SOR target N(A^{-1}b, A^{-1})."""
    op = make_op()
    omega = 1.3
    from parmgmc_tpu.samplers.sor import sor_sweep

    n = op.n
    A = np.asarray(op.to_dense())

    def det(bflat):
        return sor_sweep(
            op, bflat.reshape(GRID), jnp.zeros(GRID, jnp.float64), omega, "forward"
        ).reshape(n)

    Minv = np.asarray(jax.jacfwd(det)(jnp.zeros(n, jnp.float64)))
    M = np.linalg.inv(Minv)
    D = np.diag(np.asarray(op.diag).reshape(n))
    lhs = M + M.T - A
    rhs_ = (2 - omega) / omega * D
    np.testing.assert_allclose(lhs, rhs_, atol=1e-9)


def test_woodbury_exact_with_cholesky_inner():
    """PCWoodbury semantics: exact posterior invariance with an exact
    prior sampler (the reference's documented pairing, ex13.py:29-30)."""
    from parmgmc_tpu.samplers.woodbury import WoodburySampler

    op = make_lrc()
    inner = CholeskySampler.create(op.base)
    wb = WoodburySampler.create(op, inner)
    mean_err, cov_err = invariance_error(wb, op, rhs())
    assert mean_err < TOL and cov_err < TOL


def test_mgmc_aggregation_invariance():
    """Plain-aggregation hierarchy: star stencils at every level, exact
    Galerkin, exact invariance (the flagship bench configuration)."""
    op = make_op()
    for pre, post in [(1, 1), (1, 0)]:
        smp = MGMCSampler.create(
            op, n_levels=2, n_pre=pre, n_post=post, coarsening="aggregate"
        )
        mean_err, cov_err = invariance_error(smp, op, rhs())
        assert mean_err < TOL and cov_err < TOL, (pre, post, mean_err, cov_err)


def test_aggregation_galerkin_exact():
    from parmgmc_tpu.operators.stencil import (
        compress_stencil,
        galerkin_coarse_operator,
    )
    from parmgmc_tpu.operators.transfer import AggregateTransfer

    op = make_op()
    tr = AggregateTransfer(fine_shape=GRID)
    opc = compress_stencil(galerkin_coarse_operator(op, tr))
    assert opc.is_star()
    nc = opc.n
    eye = jnp.eye(nc, dtype=jnp.float64).reshape(nc, *opc.grid_shape)
    P = jax.vmap(tr.prolong)(eye).reshape(nc, -1).T
    Ac_ref = P.T @ np.asarray(op.to_dense()) @ P
    np.testing.assert_allclose(
        np.asarray(opc.to_dense()), np.asarray(Ac_ref), atol=1e-11
    )


def test_squared_operator_and_radius2_sampling():
    """(kappa^2 - Lap)^2 priors: radius-2 stencil extraction is exact and
    Gibbs/MGMC remain exactly invariant with (r+1)-coloring (the ex9/ex13
    squared-prior family)."""
    from parmgmc_tpu.models.problems import squared_shifted_laplace_fd

    A = make_op()
    A2 = squared_shifted_laplace_fd(GRID, 1.5, dtype=jnp.float64)
    assert A2.radius == 2
    Ad = np.asarray(A.to_dense())
    np.testing.assert_allclose(
        np.asarray(A2.to_dense()), Ad @ Ad, rtol=0, atol=1e-8
    )

    b = rhs()
    smp = GibbsSampler.create(A2, omega=1.0, sweep="forward")
    me, ce = invariance_error(smp, A2, b)
    assert me < TOL and ce < TOL, (me, ce)

    mg = MGMCSampler.create(A2, n_levels=2)
    me, ce = invariance_error(mg, A2, b)
    assert me < 1e-8 and ce < 1e-8, (me, ce)


def test_patch_gibbs_invariance():
    """ASM star-patch block-Gibbs (ex9's smoother): exact conditionals,
    exact invariance, on plain and squared operators, alone and as an
    MGMC smoother."""
    from parmgmc_tpu.models.problems import squared_shifted_laplace_fd
    from parmgmc_tpu.samplers.patch_gibbs import PatchGibbsSampler
    from parmgmc_tpu.samplers.registry import build_sampler

    op = make_op()
    b = rhs()
    smp = PatchGibbsSampler.create(op)
    me, ce = invariance_error(smp, op, b)
    assert me < TOL and ce < TOL, (me, ce)

    A2 = squared_shifted_laplace_fd(GRID, 1.5, dtype=jnp.float64)
    smp2 = PatchGibbsSampler.create(A2)
    me, ce = invariance_error(smp2, A2, b)
    assert me < 1e-9 and ce < 1e-9, (me, ce)

    mg = build_sampler(
        A2, {"type": "mgmc", "n_levels": 2, "smoother": {"type": "patch_gibbs"}}
    )
    me, ce = invariance_error(mg, A2, b)
    assert me < 1e-9 and ce < 1e-9, (me, ce)


def test_mgmc_wcycle_invariance():
    """W-cycles (gamma=2): the coarse correction is a 2-step coarse chain,
    still exactly invariant."""
    op = make_op()
    smp = MGMCSampler.create(op, n_levels=3, gamma=2)
    mean_err, cov_err = invariance_error(smp, op, rhs())
    assert mean_err < TOL and cov_err < TOL, (mean_err, cov_err)


def test_graph_patch_gibbs_invariance():
    """Vertex-star block-Gibbs on an UNSTRUCTURED GraphOperator (the
    mesh form of ex9's ASMStarPC smoother): exact conditionals, exact
    invariance, alone and via the registry."""
    import scipy.sparse as sp

    from parmgmc_tpu.operators.graph import from_csr
    from parmgmc_tpu.samplers.patch_gibbs import GraphPatchGibbsSampler
    from parmgmc_tpu.samplers.registry import build_sampler

    op_fd = make_op()
    A = sp.csr_matrix(np.asarray(op_fd.to_dense(), np.float64))
    gop = from_csr(A, dtype=jnp.float64)

    smp = GraphPatchGibbsSampler.create(gop)
    assert smp.ncolors >= 4  # distance-4 colouring is nontrivial
    b = gop.to_internal(rhs().reshape(-1))
    me, ce = invariance_error(smp, gop, b)
    assert me < TOL and ce < TOL, (me, ce)

    smp2 = build_sampler(gop, {"type": "patch_gibbs"})
    assert type(smp2).__name__ == "GraphPatchGibbsSampler"
