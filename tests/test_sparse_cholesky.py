"""Large-n sparse exact Cholesky sampler (host-side LDL^T).

Machine-precision oracles for the sparse factor's sampling map (the
affine map's covariance must be exactly A^{-1} / A_post^{-1}), CSR
export round-trips, and a standalone large-n drive on the refined
wrench mesh — the reference cholsampler's production regime
(pc_chols.c:17-27, ex13.py:29-30).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from parmgmc_tpu.models.mesh import (
    matern_precision_mesh,
    read_gmsh,
    refine,
    unit_square_mesh,
)
from parmgmc_tpu.operators.graph import from_csr
from parmgmc_tpu.operators.lrc import LRCOperator
from parmgmc_tpu.operators.stencil import shifted_laplace_fd
from parmgmc_tpu.samplers.cholesky import (
    CholeskySampler,
    SparseCholeskySampler,
    exact_sampler,
)

from parmgmc_tpu.models.mesh import mesh_path

WRENCH = mesh_path("wrench")  # repo-owned data/wrench.msh (reference fallback)


def test_stencil_to_csr_matches_dense():
    op = shifted_laplace_fd((5, 6), 1.3, dtype=jnp.float64)
    A = op.to_csr().toarray()
    np.testing.assert_allclose(A, np.asarray(op.to_dense()), atol=1e-14)


def test_graph_to_csr_matches_dense():
    pts, cells = unit_square_mesh(6)
    Ac = matern_precision_mesh(pts, cells, 2.0)
    op = from_csr(Ac, dtype=jnp.float64)
    np.testing.assert_allclose(
        op.to_csr().toarray(), np.asarray(op.to_dense()), atol=1e-14
    )


def test_sparse_factor_covariance_exact():
    """S S^T == A^{-1} to rounding, where S is the sampler's noise map
    (materialised by pushing the identity through _sqrt_apply)."""
    op = shifted_laplace_fd((7, 9), 1.0, dtype=jnp.float64)
    smp = SparseCholeskySampler.create(op)
    S = smp._sqrt_apply(np.eye(op.n))
    Ainv = np.linalg.inv(np.asarray(op.to_dense(), np.float64))
    np.testing.assert_allclose(S @ S.T, Ainv, atol=1e-12)
    # mean
    b = np.sin(np.arange(op.n, dtype=np.float64)).reshape(op.grid_shape)
    np.testing.assert_allclose(
        smp.mean(b).reshape(-1), Ainv @ b.reshape(-1), atol=1e-12
    )


def test_sparse_lrc_matheron_exact():
    """Matheron posterior draws: the affine map of (eta, eps) has
    covariance exactly A_post^{-1}; the mean is A_post^{-1} b."""
    base = shifted_laplace_fd((7, 9), 1.0, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    k = 3
    B = jnp.asarray(rng.standard_normal((*base.grid_shape, k)))
    sigma_inv = jnp.asarray([2.0, 0.7, 1.1])
    op = LRCOperator(base=base, B=B, sigma_inv=sigma_inv)
    smp = SparseCholeskySampler.create(op)

    n = base.n
    # affine map columns: x(eta, eps) - x(0, 0)
    from scipy.linalg import cho_solve

    lr = smp._lrc
    S = smp._sqrt_apply(np.eye(n))
    CM = lr["C"] @ cho_solve((lr["M_cho"], True), np.eye(k))
    K_eta = S - CM @ (lr["B"].T @ S)  # d x / d eta
    K_eps = -CM @ np.diag(np.sqrt(lr["sigma"]))  # d x / d eps
    cov = K_eta @ K_eta.T + K_eps @ K_eps.T
    Apost = np.asarray(op.to_dense(), np.float64)
    np.testing.assert_allclose(cov, np.linalg.inv(Apost), atol=1e-12)

    b = rng.standard_normal(n)
    np.testing.assert_allclose(
        smp.mean(b.reshape(base.grid_shape)).reshape(-1),
        np.linalg.solve(Apost, b),
        atol=1e-12,
    )


def test_exact_sampler_dispatch():
    small = shifted_laplace_fd((4, 4), 1.0, dtype=jnp.float64)
    assert isinstance(exact_sampler(small), CholeskySampler)
    big = shifted_laplace_fd((8, 8), 1.0, dtype=jnp.float64)
    assert isinstance(
        exact_sampler(big, dense_threshold=32), SparseCholeskySampler
    )


def test_wrench_large_n_standalone():
    """Standalone exact sampling on the refined wrench mesh (36k DOFs,
    ~2x the dense threshold's practical ceiling): factor, draw, and
    validate mean + variance probes against the factorization itself.
    The 265k-DOF refine-4 drive lives in examples/ex13_cholsampler.py
    (same code path, heavier)."""
    pts, cells = read_gmsh(WRENCH)
    for _ in range(3):
        pts, cells = refine(pts, cells)
    A = matern_precision_mesh(pts, cells, 1.0)
    op = from_csr(A, dtype=jnp.float64)
    n = op.n
    assert n > 30_000
    smp = SparseCholeskySampler.create(op)

    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    mu = smp.mean(b).reshape(-1)
    # factor-independent residual check: A mu == b
    r = np.abs(op.to_csr() @ mu - b).max() / np.abs(b).max()
    assert r < 1e-8, r

    m = 256
    xs = smp.sample(7, m, b=b).reshape(m, n)
    # variance probes: Var(g^T x) must equal g^T A^{-1} g
    for seed in range(3):
        g = np.random.default_rng(seed).standard_normal(n) / np.sqrt(n)
        proj = xs @ g
        want = float(g @ smp._lu.solve(g))
        got = float(proj.var(ddof=1))
        assert abs(got - want) / want < 0.5, (seed, got, want)
        mean_se = np.sqrt(want / m)
        assert abs(proj.mean() - g @ mu) < 6 * mean_se
