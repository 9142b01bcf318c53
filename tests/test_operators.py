"""Exact algebraic tests for stencil operators and grid transfers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parmgmc_tpu.operators.stencil import (
    StencilOperator,
    coarse_shape,
    galerkin_coarse_operator,
    prolong,
    restrict,
    shifted_laplace_fd,
)


def dense_shifted_laplace_np(shape, kappa):
    """Direct dense assembly replicating /root/reference/src/problems.c."""
    d = len(shape)
    n = int(np.prod(shape))
    hinv2 = float((shape[0] - 1) ** 2)
    A = np.zeros((n, n))
    strides = np.array([int(np.prod(shape[a + 1 :])) for a in range(d)])

    for idx in np.ndindex(*shape):
        r = int(np.dot(idx, strides))
        diag = kappa * kappa
        for axis in range(d):
            for s in (-1, 1):
                j = list(idx)
                j[axis] += s
                if 0 <= j[axis] < shape[axis]:
                    c = int(np.dot(j, strides))
                    A[r, c] = -hinv2
                    diag += hinv2
        A[r, r] = diag
    return A


@pytest.mark.parametrize("shape", [(5, 7), (9, 9), (4, 5, 6)])
def test_shifted_laplace_matches_dense(shape):
    kappa = 10.0
    op = shifted_laplace_fd(shape, kappa, dtype=jnp.float64)
    A = np.asarray(op.to_dense())
    A_ref = dense_shifted_laplace_np(shape, kappa)
    np.testing.assert_allclose(A, A_ref, rtol=0, atol=1e-12)


def test_operator_is_symmetric_spd():
    op = shifted_laplace_fd((6, 5), 2.0, dtype=jnp.float64)
    A = np.asarray(op.to_dense())
    np.testing.assert_allclose(A, A.T, atol=1e-14)
    w = np.linalg.eigvalsh(A)
    assert w.min() > 0


@pytest.mark.parametrize("fshape", [(9, 9), (8, 8), (7, 10), (5, 6, 7)])
def test_restrict_is_prolong_transpose(fshape):
    key = jax.random.PRNGKey(0)
    cshape = coarse_shape(fshape)
    kc, kf = jax.random.split(key)
    c = jax.random.normal(kc, cshape, dtype=jnp.float64)
    f = jax.random.normal(kf, fshape, dtype=jnp.float64)
    lhs = jnp.vdot(prolong(c, fshape), f)
    rhs = jnp.vdot(c, restrict(f))
    assert abs(lhs - rhs) < 1e-12


def test_prolong_partition_interior():
    # Interior fine nodes get interpolation weights summing to 1.
    fshape = (9, 9)
    c = jnp.ones(coarse_shape(fshape), dtype=jnp.float64)
    f = prolong(c, fshape)
    np.testing.assert_allclose(np.asarray(f), 1.0, atol=1e-14)


@pytest.mark.parametrize("fshape", [(9, 9), (8, 8), (9, 8), (7, 7, 7), (8, 8, 8)])
def test_galerkin_coarse_operator_exact(fshape):
    """Closed-form comb-extracted A_c must equal dense P^T A P exactly."""
    op = shifted_laplace_fd(fshape, 3.0, dtype=jnp.float64)
    opc = galerkin_coarse_operator(op)

    cshape = coarse_shape(fshape)
    nc = int(np.prod(cshape))
    # dense P via column probing
    eye = jnp.eye(nc, dtype=jnp.float64).reshape((nc, *cshape))
    P = jax.vmap(lambda e: prolong(e, fshape))(eye).reshape(nc, -1).T  # (nf, nc)
    A = np.asarray(op.to_dense())
    Ac_ref = P.T @ A @ P
    Ac = np.asarray(opc.to_dense())
    np.testing.assert_allclose(Ac, np.asarray(Ac_ref), rtol=0, atol=1e-11)


def test_galerkin_twice_levels():
    """Repeated coarsening of a 9-point coarse operator stays exact."""
    op = shifted_laplace_fd((9, 9), 1.0, dtype=jnp.float64)
    op1 = galerkin_coarse_operator(op)
    op2 = galerkin_coarse_operator(op1)

    cshape1 = coarse_shape((9, 9))
    cshape2 = coarse_shape(cshape1)
    nc1 = int(np.prod(cshape1))
    nc2 = int(np.prod(cshape2))
    eye = jnp.eye(nc2, dtype=jnp.float64).reshape((nc2, *cshape2))
    P = jax.vmap(lambda e: prolong(e, cshape1))(eye).reshape(nc2, -1).T
    Ac_ref = P.T @ np.asarray(op1.to_dense()) @ P
    np.testing.assert_allclose(
        np.asarray(op2.to_dense()), np.asarray(Ac_ref), rtol=0, atol=1e-11
    )


@pytest.mark.parametrize("shape", [(8, 8, 8), (8, 4, 6), (8, 8)])
def test_aggregate_galerkin_closed_form(shape):
    """The closed-form aggregate coarse operator (kappa2' = 2^d kappa2,
    hinv2' = 2^(d-1) hinv2, link-count diag) must equal the comb-probed
    exact Galerkin triple product P^T A P."""
    from parmgmc_tpu.operators.stencil import (
        coarse_shape,
        compress_stencil,
        detect_fd_params,
        fd_stencil,
        galerkin_coarse_operator,
        shifted_laplace_fd,
    )
    from parmgmc_tpu.operators.transfer import AggregateTransfer

    op = shifted_laplace_fd(shape, 1.7, dtype=jnp.float64)
    fd = detect_fd_params(op)
    assert fd is not None
    d = len(shape)
    probe = compress_stencil(
        galerkin_coarse_operator(op, AggregateTransfer(fine_shape=shape))
    )
    closed = fd_stencil(
        coarse_shape(shape),
        (2**d) * float(fd[0]),
        (2 ** (d - 1)) * float(fd[1]),
        dtype=jnp.float64,
    )
    err = float(jnp.abs(probe.to_dense() - closed.to_dense()).max())
    assert err < 1e-9, err
