"""Pallas kernel regression tests (interpret mode, deterministic path).

The stochastic path (on-chip PRNG) cannot run in CPU interpret mode;
its statistical equivalence to the lax path was validated on TPU (see
BENCH_NOTES.md).  Here the deterministic sweeps (noise disabled) must
match the lax multicolor sweep exactly for both kernel variants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parmgmc_tpu.kernels.rb_gibbs import (
    fused_rb_gibbs_sweep,
    fused_rb_gibbs_sweep_fd,
)
from parmgmc_tpu.operators.stencil import shifted_laplace_fd
from parmgmc_tpu.samplers.sor import sor_sweep

SHAPE = (16, 128, 128)


@pytest.fixture(scope="module")
def problem():
    op = shifted_laplace_fd(SHAPE, 2.0, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, SHAPE, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), SHAPE, jnp.float32)
    coeffs = jnp.asarray([float(c) for c in op.coeffs], jnp.float32)
    return op, x, b, coeffs


@pytest.mark.parametrize("sweep", ["forward", "backward"])
def test_fused_sweep_matches_lax(problem, sweep):
    op, x, b, coeffs = problem
    ref = sor_sweep(op, b, x, 1.3, sweep)
    out = fused_rb_gibbs_sweep(
        x, b, op.diag, coeffs, 1.3, 0, 0,
        noise_mult=0.0, sweep=sweep, interpret=True, with_noise=False,
    )
    err = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
    assert err < 1e-5, err


@pytest.mark.parametrize("sweep", ["forward", "backward"])
def test_fused_fd_sweep_matches_lax(problem, sweep):
    op, x, b, coeffs = problem
    hinv2 = -float(op.coeffs[0])
    kappa2 = 4.0
    ref = sor_sweep(op, b, x, 1.3, sweep)
    out = fused_rb_gibbs_sweep_fd(
        x, b, coeffs, kappa2, hinv2, 1.3, 0, 0,
        noise_mult=0.0, sweep=sweep, interpret=True, with_noise=False,
    )
    err = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
    assert err < 1e-5, err


@pytest.mark.parametrize("sweep", ["forward", "backward"])
@pytest.mark.parametrize("shape", [SHAPE, (8, 10, 128)])
def test_fused_down_phase_matches_lax(sweep, shape):
    """kernels.mg_sweep: from-zero sweep + residual + restriction must
    reproduce sor_sweep + apply + AggregateTransfer.restrict exactly."""
    from parmgmc_tpu.kernels.mg_sweep import fused_zero_gibbs_restrict_fd
    from parmgmc_tpu.operators.transfer import AggregateTransfer

    op = shifted_laplace_fd(shape, 1.7, dtype=jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32)
    coeffs = jnp.asarray([float(c) for c in op.coeffs], jnp.float32)
    hinv2 = -float(op.coeffs[0])
    y, rq = fused_zero_gibbs_restrict_fd(
        b, coeffs, 1.7**2, hinv2, 1.0, 0, 0,
        sweep=sweep, interpret=True, with_noise=False,
    )
    rc = rq.reshape(
        shape[0] // 2, shape[1] // 2, shape[2] // 2, 2
    ).sum(-1)
    y_ref = sor_sweep(op, b, jnp.zeros_like(b), 1.0, sweep)
    tr = AggregateTransfer(fine_shape=shape)
    rc_ref = tr.restrict(b - op.apply(y_ref))
    ey = float(jnp.abs(y - y_ref).max() / jnp.abs(y_ref).max())
    erc = float(jnp.abs(rc - rc_ref).max() / jnp.abs(rc_ref).max())
    assert ey < 1e-5, ey
    assert erc < 1e-4, erc


@pytest.mark.parametrize("sweep", ["forward", "backward"])
@pytest.mark.parametrize("shape", [SHAPE, (8, 8, 128)])
def test_fused_chain_down_matches_lax(sweep, shape):
    """kernels.mg_sweep._kernel_chain: residual + from-zero sweep + state
    add + restriction must reproduce the lax composition exactly."""
    from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_fd
    from parmgmc_tpu.operators.transfer import AggregateTransfer

    op = shifted_laplace_fd(shape, 1.7, dtype=jnp.float32)
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    coeffs = jnp.asarray([float(c) for c in op.coeffs], jnp.float32)
    hinv2 = -float(op.coeffs[0])
    xpy, rq = fused_chain_down_fd(
        x, b, coeffs, 1.7**2, hinv2, 1.0, 0, 0,
        sweep=sweep, interpret=True, with_noise=False,
    )
    rc = rq.reshape(
        shape[0] // 2, shape[1] // 2, shape[2] // 2, 2
    ).sum(-1)
    r_ref = b - op.apply(x)
    y_ref = sor_sweep(op, r_ref, jnp.zeros_like(b), 1.0, sweep)
    tr = AggregateTransfer(fine_shape=shape)
    rc_ref = tr.restrict(r_ref - op.apply(y_ref))
    exy = float(jnp.abs(xpy - (x + y_ref)).max() / jnp.abs(x + y_ref).max())
    erc = float(jnp.abs(rc - rc_ref).max() / jnp.abs(rc_ref).max())
    assert exy < 1e-5, exy
    assert erc < 1e-4, erc


@pytest.mark.parametrize("sweep", ["forward", "backward"])
@pytest.mark.parametrize("tile2d", [(4, 8), (4, 16), (2, 32)])
def test_fused_2d_sweep_matches_lax(sweep, tile2d):
    """kernels.rb_gibbs v3 (2D-tiled window): deterministic sweep must
    match the lax multicolor sweep exactly for general (diag-streamed)
    and FD (diag-recomputed) modes, at several in-plane tilings."""
    from parmgmc_tpu.kernels.rb_gibbs import fused_rb_gibbs_sweep_2d

    shape = (8, 32, 128)
    op = shifted_laplace_fd(shape, 1.7, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    coeffs = jnp.asarray([float(c) for c in op.coeffs], jnp.float32)
    ref = sor_sweep(op, b, x, 1.3, sweep)
    out = fused_rb_gibbs_sweep_2d(
        x, b, op.diag, coeffs, 1.3, 0, 0,
        noise_mult=0.0, sweep=sweep, tile2d=tile2d,
        interpret=True, with_noise=False,
    )
    err = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
    assert err < 1e-5, err
    hinv2 = -float(op.coeffs[0])
    out_fd = fused_rb_gibbs_sweep_2d(
        x, b, None, coeffs, 1.3, 0, 0,
        noise_mult=0.0, sweep=sweep, tile2d=tile2d,
        interpret=True, with_noise=False,
        fd_params=jnp.asarray([1.7**2, hinv2], jnp.float32),
    )
    err = float(jnp.abs(ref - out_fd).max() / jnp.abs(ref).max())
    assert err < 1e-5, err


def test_fused_2d_sweep_sharded_offsets():
    """The 2D kernel's global-row keying (row_offset / n0_global) must
    reproduce the interior of the full-grid sweep when applied to a
    halo-extended local block — the shard_map usage pattern."""
    from parmgmc_tpu.kernels.rb_gibbs import fused_rb_gibbs_sweep_2d

    shape = (16, 32, 128)
    op = shifted_laplace_fd(shape, 1.7, dtype=jnp.float32)
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    coeffs = jnp.asarray([float(c) for c in op.coeffs], jnp.float32)
    hinv2 = -float(op.coeffs[0])
    fd = jnp.asarray([1.7**2, hinv2], jnp.float32)
    full = fused_rb_gibbs_sweep_2d(
        x, b, None, coeffs, 1.0, 0, 0,
        noise_mult=0.0, sweep="forward", tile2d=(4, 8),
        interpret=True, with_noise=False, fd_params=fd,
    )
    # shard rows [8:16) with a 2-row halo, as parallel.fused would
    xl, bl = x[6:16], b[6:16]
    loc = fused_rb_gibbs_sweep_2d(
        xl, bl, None, coeffs, 1.0, 0, 0,
        noise_mult=0.0, sweep="forward", tile2d=(2, 8),
        interpret=True, with_noise=False, fd_params=fd,
        row_offset=6, n0_global=16,
    )
    err = float(jnp.abs(full[8:16] - loc[2:]).max())
    assert err < 1e-5, err


@pytest.mark.parametrize("sweep", ["forward", "backward"])
@pytest.mark.parametrize("tile2d", [(4, 8), (8, 16)])
def test_fused_chain_down_2d_matches_lax(sweep, tile2d):
    """kernels.mg_sweep._kernel_chain_2d: the 2D-tiled chain down-phase
    must reproduce residual + from-zero sweep + state add + restriction
    exactly (deterministic path)."""
    from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_2d
    from parmgmc_tpu.operators.transfer import AggregateTransfer

    shape = (16, 32, 128)
    op = shifted_laplace_fd(shape, 1.7, dtype=jnp.float32)
    key = jax.random.PRNGKey(13)
    x = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    coeffs = jnp.asarray([float(c) for c in op.coeffs], jnp.float32)
    hinv2 = -float(op.coeffs[0])
    xpy, rq = fused_chain_down_2d(
        x, b, coeffs, 1.7**2, hinv2, 1.0, 0, 0,
        sweep=sweep, tile2d=tile2d, interpret=True, with_noise=False,
    )
    rc = rq.reshape(
        shape[0] // 2, shape[1] // 2, shape[2] // 2, 2
    ).sum(-1)
    r_ref = b - op.apply(x)
    y_ref = sor_sweep(op, r_ref, jnp.zeros_like(b), 1.0, sweep)
    tr = AggregateTransfer(fine_shape=shape)
    rc_ref = tr.restrict(r_ref - op.apply(y_ref))
    exy = float(jnp.abs(xpy - (x + y_ref)).max() / jnp.abs(x + y_ref).max())
    erc = float(jnp.abs(rc - rc_ref).max() / jnp.abs(rc_ref).max())
    assert exy < 1e-5, exy
    assert erc < 1e-4, erc


@pytest.mark.parametrize("sweep", ["forward", "backward"])
def test_fused_sweep_2d_staged_matches_windowed(sweep):
    """kernels.rb_gibbs._kernel_2d_staged: the staged-slab 2D sweep must
    reproduce the windowed v3 sweep exactly (deterministic path), incl.
    under the sharded halo-offset contract."""
    from parmgmc_tpu.kernels.rb_gibbs import (
        fused_rb_gibbs_sweep_2d,
        fused_rb_gibbs_sweep_2d_staged,
    )

    shape = (16, 32, 128)
    op = shifted_laplace_fd(shape, 1.7, dtype=jnp.float32)
    key = jax.random.PRNGKey(41)
    x = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    coeffs = jnp.asarray([float(c) for c in op.coeffs], jnp.float32)
    hinv2 = -float(op.coeffs[0])
    fd = jnp.asarray([1.7**2, hinv2], jnp.float32)
    kw = dict(
        noise_mult=0.0, sweep=sweep, interpret=True,
        with_noise=False, fd_params=fd,
    )
    ref = fused_rb_gibbs_sweep_2d(
        x, b, None, coeffs, 1.2, 0, 0, tile2d=(4, 8), **kw
    )
    for t_st in ((4, 8), (8, 16)):
        got = fused_rb_gibbs_sweep_2d_staged(
            x, b, coeffs, 1.2, 0, 0, tile2d=t_st, **kw
        )
        rel = float(jnp.abs(ref - got).max()) / (
            float(jnp.abs(ref).max()) + 1e-30
        )
        assert rel < 1e-5, (t_st, rel)
    # sharded contract: 4-row-halo local block reproduces the interior
    xl, bl = x[4:16], b[4:16]
    loc = fused_rb_gibbs_sweep_2d_staged(
        xl, bl, coeffs, 1.2, 0, 0, tile2d=(4, 8),
        row_offset=4, n0_global=16, **kw,
    )
    err = float(jnp.abs(ref[8:16] - loc[4:]).max())
    assert err < 1e-5, err


@pytest.mark.parametrize("sweep", ["forward", "backward"])
def test_fused_chain_down_2d_staged_matches_windowed(sweep):
    """kernels.mg_sweep._kernel_chain_2d_staged: the staged-slab 2D
    chain kernel must reproduce the windowed v3 kernel exactly
    (deterministic path) in every option combination — plain, b=None,
    deferred zf, and the xsum/zsum extras (per-strip partials summed by
    the wrapper)."""
    from parmgmc_tpu.kernels.mg_sweep import (
        fused_chain_down_2d,
        fused_chain_down_2d_staged,
    )

    shape = (16, 32, 128)
    N0, N1, N2 = shape
    key = jax.random.PRNGKey(29)
    x = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    z = jax.random.normal(
        jax.random.fold_in(key, 2),
        (N0 // 2, N1 // 2, 1, N2 // 2, 1),
        jnp.float32,
    )
    zf = jnp.broadcast_to(z, (N0 // 2, N1 // 2, 2, N2 // 2, 2)).reshape(
        N0 // 2, N1, N2
    )
    hinv2 = float((N0 - 1) ** 2)
    coeffs = jnp.full((6,), -hinv2, jnp.float32)
    kw = dict(sweep=sweep, interpret=True, with_noise=False)
    for use_b, use_z in ((True, False), (False, True)):
        zkw = dict(zf=zf, with_xsum=True, with_zsum=True) if use_z else {}
        bb = b if use_b else None
        ref = fused_chain_down_2d(
            x, bb, coeffs, 1.0, hinv2, 1.0, 3, 5,
            tile2d=(4, 8), staged=False, **kw, **zkw,
        )
        got = fused_chain_down_2d_staged(
            x, bb, coeffs, 1.0, hinv2, 1.0, 3, 5, tile2d=(4, 8), **kw, **zkw,
        )
        for i, (u, v) in enumerate(zip(ref, got)):
            assert u.shape == v.shape, (use_b, use_z, i)
            d = float(jnp.abs(u - v).max())
            rel = d / (float(jnp.abs(u).max()) + 1e-30)
            assert rel < 1e-5, (use_b, use_z, i, rel)
        # a second tiling must agree too (tile-boundary independence)
        got2 = fused_chain_down_2d_staged(
            x, bb, coeffs, 1.0, hinv2, 1.0, 3, 5, tile2d=(8, 16), **kw, **zkw,
        )
        for i, (u, v) in enumerate(zip(ref, got2)):
            rel = float(jnp.abs(u - v).max()) / (
                float(jnp.abs(u).max()) + 1e-30
            )
            assert rel < 1e-5, ("tile2", use_b, use_z, i, rel)


@pytest.mark.parametrize("sweep", ["forward", "backward"])
def test_fused_chain_down_2d_staged_zx2_matches_zf(sweep):
    """The staged kernel's zx2 carry layout (lanes pre-duplicated,
    sublanes compressed, in-kernel sublane expansion through the zex
    scratch) must reproduce the zf layout exactly, with the documented
    zsum reweighting 4*sum(zsum_zx2) == 2*sum(zsum_zf)."""
    from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_2d_staged

    shape = (16, 32, 128)
    N0, N1, N2 = shape
    key = jax.random.PRNGKey(37)
    x = jax.random.normal(key, shape, jnp.float32)
    z = jax.random.normal(
        jax.random.fold_in(key, 1),
        (N0 // 2, N1 // 2, N2 // 2),
        jnp.float32,
    )
    zf = jnp.broadcast_to(
        z[:, :, None, :, None], (N0 // 2, N1 // 2, 2, N2 // 2, 2)
    ).reshape(N0 // 2, N1, N2)
    zx2 = jnp.broadcast_to(z[..., None], (*z.shape, 2)).reshape(
        N0 // 2, N1 // 2, N2
    )
    hinv2 = float((N0 - 1) ** 2)
    coeffs = jnp.full((6,), -hinv2, jnp.float32)
    kw = dict(
        sweep=sweep, interpret=True, with_noise=False,
        with_xsum=True, with_zsum=True,
    )
    # b=None (the flagship prior-sampling path) and the doff={0,8}
    # in-plane offsets both exercised: tile (4,16) makes the zx2 window
    # wider than the x window on interior strips
    a = fused_chain_down_2d_staged(
        x, None, coeffs, 1.0, hinv2, 1.0, 3, 5, tile2d=(4, 8), zf=zf, **kw
    )
    c = fused_chain_down_2d_staged(
        x, None, coeffs, 1.0, hinv2, 1.0, 3, 5, tile2d=(4, 16), zx2=zx2, **kw
    )
    for i in range(3):
        rel = float(jnp.abs(a[i] - c[i]).max()) / (
            float(jnp.abs(a[i]).max()) + 1e-30
        )
        assert rel < 1e-5, (i, rel)
    assert abs(
        2.0 * float(a[3].sum()) - 4.0 * float(c[3].sum())
    ) < 1e-3 * max(1.0, abs(2.0 * float(a[3].sum())))


def test_fused_chain_down_2d_staged_sharded_offsets():
    """Staged 2D chain kernel under the parallel.fused contract: applied
    to a 4-plane halo-extended local block with row_offset/n0_global it
    must reproduce the interior of the full-grid down-phase."""
    from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_2d_staged

    shape = (32, 32, 128)
    op = shifted_laplace_fd(shape, 1.7, dtype=jnp.float32)
    key = jax.random.PRNGKey(31)
    x = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    coeffs = jnp.asarray([float(c) for c in op.coeffs], jnp.float32)
    hinv2 = -float(op.coeffs[0])
    kw = dict(sweep="forward", interpret=True, with_noise=False)
    xpy_full, rq_full = fused_chain_down_2d_staged(
        x, b, coeffs, 1.7**2, hinv2, 1.0, 0, 0, tile2d=(4, 8), **kw
    )
    # shard rows [16:32) with a 4-plane halo, as _sharded_chain_down does
    xl, bl = x[12:32], b[12:32]
    xpy_l, rq_l = fused_chain_down_2d_staged(
        xl, bl, coeffs, 1.7**2, hinv2, 1.0, 0, 0, tile2d=(4, 8),
        row_offset=12, n0_global=32, **kw,
    )
    exy = float(jnp.abs(xpy_full[16:32] - xpy_l[4:]).max())
    erq = float(jnp.abs(rq_full[8:16] - rq_l[2:]).max())
    assert exy < 1e-5, exy
    assert erq < 1e-4, erq


@pytest.mark.parametrize("shape", [(10, 24, 128), (12, 40, 128), (8, 48, 256)])
def test_fused_2d_sweep_odd_shapes(shape):
    """2D-tiled sweep across awkward tilings (non-power-of-2 N0, small
    N1, auto tiles): deterministic parity with the lax sweep."""
    from parmgmc_tpu.kernels.rb_gibbs import fused_rb_gibbs_sweep_2d

    op = shifted_laplace_fd(shape, 1.3, dtype=jnp.float32)
    key = jax.random.PRNGKey(sum(shape))
    x = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    coeffs = jnp.asarray([float(c) for c in op.coeffs], jnp.float32)
    hinv2 = -float(op.coeffs[0])
    for sweep in ("forward", "backward"):
        ref = sor_sweep(op, b, x, 1.1, sweep)
        out = fused_rb_gibbs_sweep_2d(
            x, b, None, coeffs, 1.1, 0, 0,
            noise_mult=0.0, sweep=sweep, interpret=True, with_noise=False,
            fd_params=jnp.asarray([1.3**2, hinv2], jnp.float32),
        )
        err = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
        assert err < 1e-5, (shape, sweep, err)


def test_fused_chain_down_sharded_offsets():
    """The chain kernels' global-row keying: the 1D chain kernel applied
    to a 4-plane halo-extended local block must reproduce the interior
    of the full-grid chain down-phase (the parallel.fused usage)."""
    from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_fd

    shape = (32, 16, 128)
    op = shifted_laplace_fd(shape, 1.7, dtype=jnp.float32)
    key = jax.random.PRNGKey(21)
    x = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    coeffs = jnp.asarray([float(c) for c in op.coeffs], jnp.float32)
    hinv2 = -float(op.coeffs[0])
    xpy_full, rq_full = fused_chain_down_fd(
        x, b, coeffs, 1.7**2, hinv2, 1.0, 0, 0,
        sweep="forward", interpret=True, with_noise=False,
    )
    # shard rows [16:32) with a 4-plane halo, as _sharded_chain_down does
    xl, bl = x[12:32], b[12:32]
    xpy_l, rq_l = fused_chain_down_fd(
        xl, bl, coeffs, 1.7**2, hinv2, 1.0, 0, 0,
        sweep="forward", interpret=True, with_noise=False,
        row_offset=12, n0_global=32,
    )
    exy = float(jnp.abs(xpy_full[16:32] - xpy_l[4:]).max())
    erq = float(jnp.abs(rq_full[8:16] - rq_l[2:]).max())
    assert exy < 1e-5, exy
    assert erq < 1e-4, erq


def test_fused_chain_down_deferred_z():
    """Deferred prolong-add: the chain kernel given (xpy, zx2) must be
    bit-identical to materialising x = xpy + P z first, and the optional
    xsum output must equal xpy.sum(axis=1) (samplers/mgmc.step_deferred,
    chain.sample_chain_deferred)."""
    from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_fd
    from parmgmc_tpu.operators.transfer import AggregateTransfer

    shape = (16, 16, 128)
    key = jax.random.PRNGKey(3)
    xpy_prev = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    z = jax.random.normal(
        jax.random.fold_in(key, 2),
        (shape[0] // 2, shape[1] // 2, shape[2] // 2),
        jnp.float32,
    )
    hinv2 = float((shape[0] - 1) ** 2)
    coeffs = jnp.full((6,), -hinv2, jnp.float32)
    kw = dict(sweep="forward", interpret=True, with_noise=False)

    tr = AggregateTransfer(fine_shape=shape)
    x = xpy_prev + tr.prolong(z)
    xpy_a, rq_a = fused_chain_down_fd(x, b, coeffs, 1.0, hinv2, 1.0, 3, 5, **kw)

    zx2 = jnp.broadcast_to(z[..., None], (*z.shape, 2)).reshape(
        shape[0] // 2, shape[1] // 2, shape[2]
    )
    xpy_b, rq_b, xsum, zsum = fused_chain_down_fd(
        xpy_prev, b, coeffs, 1.0, hinv2, 1.0, 3, 5,
        zx2=zx2, with_xsum=True, with_zsum=True, **kw,
    )
    assert bool(jnp.all(xpy_a == xpy_b))
    assert bool(jnp.all(rq_a == rq_b))
    assert float(jnp.abs(xsum[:, 0, :] - xpy_b.sum(1)).max()) == 0.0
    # zsum accumulates the zx2 INPUT's (rows, sublanes) sums per lane
    want_zsum = zx2.sum(axis=(0, 1))
    assert float(jnp.abs(zsum[0, 0, :] - want_zsum).max()) < 1e-4


def test_fused_chain_down_2d_deferred_z():
    """2D-tiled deferred prolong-add: the kernel given (xpy, zf) must be
    bit-identical to materialising x = xpy + P z first, and the optional
    xsum/zsum outputs must match direct sums (the zf layout keeps
    sublanes and lanes at fine resolution — kernels.mg_sweep
    fused_chain_down_2d, BENCH_NOTES 'Mosaic probes')."""
    from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_2d
    from parmgmc_tpu.operators.transfer import AggregateTransfer

    shape = (16, 32, 128)
    key = jax.random.PRNGKey(7)
    xpy_prev = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    z = jax.random.normal(
        jax.random.fold_in(key, 2),
        (shape[0] // 2, shape[1] // 2, shape[2] // 2),
        jnp.float32,
    )
    hinv2 = float((shape[0] - 1) ** 2)
    coeffs = jnp.full((6,), -hinv2, jnp.float32)

    for tile2d in ((4, 8), (8, 16)):
        kw = dict(
            sweep="forward", tile2d=tile2d, interpret=True, with_noise=False
        )
        tr = AggregateTransfer(fine_shape=shape)
        x = xpy_prev + tr.prolong(z)
        xpy_a, rq_a = fused_chain_down_2d(
            x, b, coeffs, 1.0, hinv2, 1.0, 3, 5, **kw
        )

        zf = jnp.broadcast_to(
            z[:, :, None, :, None],
            (shape[0] // 2, shape[1] // 2, 2, shape[2] // 2, 2),
        ).reshape(shape[0] // 2, shape[1], shape[2])
        xpy_b, rq_b, xsum, zsum = fused_chain_down_2d(
            xpy_prev, b, coeffs, 1.0, hinv2, 1.0, 3, 5,
            zf=zf, with_xsum=True, with_zsum=True, **kw,
        )
        assert bool(jnp.all(xpy_a == xpy_b)), tile2d
        assert bool(jnp.all(rq_a == rq_b)), tile2d
        assert float(jnp.abs(xsum[:, 0, :] - xpy_b.sum(1)).max()) < 1e-4
        want_zsum = zf.sum(axis=(0, 1))
        assert float(jnp.abs(zsum[0, 0, :] - want_zsum).max()) < 1e-3


def test_fused_chain_down_zero_rhs():
    """b=None (zero RHS, the prior-sampling flagship): both chain
    kernels must be BIT-identical to streaming explicit zeros, in plain
    and deferred-z (+xsum/zsum) modes — kernels.mg_sweep with_b=False
    drops the whole b stream."""
    from parmgmc_tpu.kernels.mg_sweep import (
        fused_chain_down_2d,
        fused_chain_down_fd,
    )

    shape = (16, 16, 128)
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, shape, jnp.float32)
    z = jax.random.normal(
        jax.random.fold_in(key, 2),
        (shape[0] // 2, shape[1] // 2, shape[2] // 2),
        jnp.float32,
    )
    zeros = jnp.zeros(shape, jnp.float32)
    hinv2 = float((shape[0] - 1) ** 2)
    coeffs = jnp.full((6,), -hinv2, jnp.float32)
    kw = dict(sweep="forward", interpret=True, with_noise=False)

    xpy_a, rq_a = fused_chain_down_fd(
        x, zeros, coeffs, 1.0, hinv2, 1.0, 3, 5, **kw
    )
    xpy_b, rq_b = fused_chain_down_fd(
        x, None, coeffs, 1.0, hinv2, 1.0, 3, 5, **kw
    )
    assert bool(jnp.all(xpy_a == xpy_b))
    assert bool(jnp.all(rq_a == rq_b))

    zx2 = jnp.broadcast_to(z[..., None], (*z.shape, 2)).reshape(
        shape[0] // 2, shape[1] // 2, shape[2]
    )
    za = fused_chain_down_fd(
        x, zeros, coeffs, 1.0, hinv2, 1.0, 3, 5,
        zx2=zx2, with_xsum=True, with_zsum=True, **kw,
    )
    zb = fused_chain_down_fd(
        x, None, coeffs, 1.0, hinv2, 1.0, 3, 5,
        zx2=zx2, with_xsum=True, with_zsum=True, **kw,
    )
    for a, bb in zip(za, zb):
        assert bool(jnp.all(a == bb))

    shape2 = (16, 32, 128)
    x2 = jax.random.normal(jax.random.fold_in(key, 3), shape2, jnp.float32)
    zeros2 = jnp.zeros(shape2, jnp.float32)
    zf = jnp.broadcast_to(
        jax.random.normal(
            jax.random.fold_in(key, 4),
            (shape2[0] // 2, shape2[1] // 2, 1, shape2[2] // 2, 1),
            jnp.float32,
        ),
        (shape2[0] // 2, shape2[1] // 2, 2, shape2[2] // 2, 2),
    ).reshape(shape2[0] // 2, shape2[1], shape2[2])
    for tile2d in ((4, 8), (8, 16)):
        kw2 = dict(
            sweep="forward", tile2d=tile2d, interpret=True, with_noise=False
        )
        a2 = fused_chain_down_2d(
            x2, zeros2, coeffs, 1.0, hinv2, 1.0, 3, 5, **kw2
        )
        b2 = fused_chain_down_2d(
            x2, None, coeffs, 1.0, hinv2, 1.0, 3, 5, **kw2
        )
        for a, bb in zip(a2, b2):
            assert bool(jnp.all(a == bb)), tile2d
        az = fused_chain_down_2d(
            x2, zeros2, coeffs, 1.0, hinv2, 1.0, 3, 5,
            zf=zf, with_xsum=True, with_zsum=True, **kw2,
        )
        bz = fused_chain_down_2d(
            x2, None, coeffs, 1.0, hinv2, 1.0, 3, 5,
            zf=zf, with_xsum=True, with_zsum=True, **kw2,
        )
        for a, bb in zip(az, bz):
            assert bool(jnp.all(a == bb)), tile2d


def test_mgmc_step_zero_rhs_matches_zeros():
    """MGMCSampler.step / step_with_noise with b=None must reproduce the
    explicit-zeros chain exactly (lax path; the kernel paths are covered
    bitwise by test_fused_chain_down_zero_rhs and on-chip by
    bench.py --selftest)."""
    from parmgmc_tpu.samplers.mgmc import MGMCSampler

    op = shifted_laplace_fd((8, 8, 8), 1.3, dtype=jnp.float32)
    smp = MGMCSampler.create(op, n_levels=2, n_pre=1, n_post=1)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, op.grid_shape, jnp.float32)
    zeros = jnp.zeros_like(x)
    _, xa = smp.step(jax.random.PRNGKey(5), x, zeros)
    _, xb = smp.step(jax.random.PRNGKey(5), x, None)
    assert bool(jnp.all(xa == xb))


def test_deferred_zf_layout_algebra():
    """The zf lazy-carry algebra (samplers.mgmc deferred_layout "zf"):
    the production broadcast + kernel leading-repeat must reconstruct
    the transfer's prolong exactly, and the layout sums must satisfy
    sum(P0 z) = 2 sum(zf); plus the routing predicates: small grids
    stay zx2/whole-plane, 512^2+ planes route to the 2D kernels — zx2
    via the staged kernel when its 16-aligned tiling fits, zf on the
    windowed fallback."""
    from parmgmc_tpu.operators.transfer import AggregateTransfer
    from parmgmc_tpu.samplers.mgmc import MGMCSampler
    from parmgmc_tpu.models.problems import gmrf_3d

    shape = (8, 16, 32)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 16), jnp.float32)
    # production: in-plane expansion (step_deferred zf branch)
    zf = jnp.broadcast_to(
        z[:, :, None, :, None], (4, 8, 2, 16, 2)
    ).reshape(4, 16, 32)
    # consumption: leading-axis repeat (the only expansion the 2D kernel
    # performs; materialize_deferred zf branch)
    zfull = jnp.broadcast_to(zf[:, None], (4, 2, 16, 32)).reshape(*shape)
    tr = AggregateTransfer(fine_shape=shape)
    assert bool(jnp.all(zfull == tr.prolong(z)))
    assert abs(
        float(2.0 * jnp.sum(zf)) - float(jnp.sum(tr.prolong(z)))
    ) < 1e-3

    # routing predicate (shape-only; no kernels run)
    smp = MGMCSampler.create(
        gmrf_3d(8, kappa=1.0, dtype=jnp.float32),
        n_pre=1, n_post=0, coarsest_size=16, coarsening="aggregate",
        impl="fused_fd",
    )
    assert smp.deferred_layout() == "zx2"
    assert not smp._chain_level0_2d()
    # shape-only probes: 768^3 routes 2D and admits the zx2 staged tile
    from parmgmc_tpu.kernels.mg_sweep import chain_down_2d_zx2_supported

    assert chain_down_2d_zx2_supported((768, 768, 768))
    assert not chain_down_2d_zx2_supported((768, 24, 768))  # N1 % 16


def test_deferred_split_level1_routing_and_algebra():
    """step_deferred splits level 1 open when it is down-fused-eligible
    but tail-ineligible (level-1 lanes %128 but not dividing 128 — the
    768^3 family and 512-lane shapes), producing the carry as
    dup(y1) + dup(P1 z2).  The algebra this relies on: expanding the
    two up-phase operands separately performs the identical single add
    per element as expanding their sum (verified bitwise on-chip at
    (16,16,512), 2026-08-19 — state, QOI trace and final carry sum all
    exactly equal).  Here: the routing predicates and the expand
    identity itself (CPU-checkable)."""
    from parmgmc_tpu.operators.stencil import shifted_laplace_fd
    from parmgmc_tpu.samplers.mgmc import MGMCSampler

    smp = MGMCSampler.create(
        shifted_laplace_fd((16, 16, 512), 1.0, dtype=jnp.float32),
        n_pre=1, n_post=0, coarsest_size=512, coarsening="aggregate",
        impl="fused_fd",
    )
    assert smp.deferred_eligible()
    # level 1 = (8, 8, 256): lanes 256 %128 == 0 (down-fusable) but 256
    # does not divide 128 (no duplicated-layout tail) -> branch active
    assert smp._down_fused_eligible(1)
    assert not smp._tail_fused_eligible(1)

    # the expand identity: dup(a) + dup(b) == dup(a + b) bitwise, both
    # carry layouts
    key = jax.random.PRNGKey(3)
    a = jax.random.normal(key, (4, 8, 16), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(4), (4, 8, 16), jnp.float32)

    def dup_zx2(v):
        return jnp.broadcast_to(v[..., None], (*v.shape, 2)).reshape(
            4, 8, 32
        )

    def dup_zf(v):
        return jnp.broadcast_to(
            v[:, :, None, :, None], (4, 8, 2, 16, 2)
        ).reshape(4, 16, 32)

    assert bool(jnp.all(dup_zx2(a) + dup_zx2(b) == dup_zx2(a + b)))
    assert bool(jnp.all(dup_zf(a) + dup_zf(b) == dup_zf(a + b)))

    # 128-lane level-1 shapes (the 256^3 family) keep the closed tail
    # path: level 1 lanes divide 128
    smp2 = MGMCSampler.create(
        shifted_laplace_fd((16, 16, 256), 1.0, dtype=jnp.float32),
        n_pre=1, n_post=0, coarsest_size=128, coarsening="aggregate",
        impl="fused_fd",
    )
    assert smp2._tail_fused_eligible(1)


def test_sample_chain_deferred_matches_standard():
    """step_deferred drives the identical chain (deterministic kernel
    paths can't run the on-chip PRNG on CPU, so this exercises the
    driver plumbing in interpret-free lax mode is impossible — instead
    compare the DETERMINISTIC materialisation identity over the lazy
    state algebra on a tiny MGMC sampler)."""
    from parmgmc_tpu.models.problems import gmrf_3d
    from parmgmc_tpu.samplers.mgmc import MGMCSampler

    op = gmrf_3d(8, kappa=1.0, dtype=jnp.float32)
    smp = MGMCSampler.create(
        op, n_pre=1, n_post=0, coarsest_size=16, coarsening="aggregate",
        impl="fused_fd",
    )
    # on CPU the fused path cannot run; eligibility must say so and the
    # lazy-state materialisation helper must match the transfer's prolong
    # (the lazy z rides in lane-duplicated zx2 form)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4), jnp.float32)
    xpy = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8), jnp.float32)
    zx2 = jnp.broadcast_to(z[..., None], (4, 4, 4, 2)).reshape(4, 4, 8)
    want = xpy + smp.transfers[0].prolong(z)
    got = smp.materialize_deferred(xpy, zx2)
    assert bool(jnp.all(want == got))


def test_fused_tail_down_matches_twin():
    """The Mosaic lowering of the tail kernel must match its pure-JAX
    twin (kernels.mg_tail shares the math; interpret mode here)."""
    from parmgmc_tpu.kernels.mg_tail import (
        fused_tail_down,
        tail_down_reference,
    )

    shapes = ((32, 32, 64), (16, 16, 32), (8, 8, 16), (4, 4, 8))
    rs = np.random.RandomState(0)
    bl = jnp.asarray(rs.randn(32, 32, 64), jnp.float32)
    bl_layout = jnp.broadcast_to(bl[..., None], (32, 32, 64, 2)).reshape(
        32, 32, 128
    )
    params, (k2, h2) = [], (1.0, float(31**2))
    for _ in range(3):
        params += [1.0, k2, h2]
        k2, h2 = 8 * k2, 4 * h2
    params = jnp.asarray(params, jnp.float32)

    for wn in (False, True):
        ys_k, rhs_k = fused_tail_down(
            bl_layout, params, 3, 7, 0, shapes, with_noise=wn, interpret=True
        )
        ys_r, rhs_r = tail_down_reference(
            bl_layout, params, 3, 7, 0, shapes, with_noise=wn
        )
        for a, b, shp in zip(ys_k, ys_r, shapes):
            scale = float(jnp.abs(b).max()) + 1e-30
            assert float(jnp.abs(a - b).max()) / scale < 1e-5
            # duplication invariant: all slots of a true dof identical
            n0, n1, n2 = shp
            g, f = 32 // n1, 128 // n2
            av = np.asarray(a).reshape(n0, n1, g, n2, f)
            assert (av == av[:, :, :1, :, :1]).all()
        scale = float(jnp.abs(rhs_r).max()) + 1e-30
        assert float(jnp.abs(rhs_k - rhs_r).max()) / scale < 1e-5


def test_fused_tail_down_deterministic_semantics():
    """with_noise=False tail output == per-level deterministic from-zero
    sweeps + exact restrictions computed with the production operators
    (samplers.gibbs lax sweep + operators.transfer)."""
    from parmgmc_tpu.kernels.mg_tail import fused_tail_down
    from parmgmc_tpu.models.problems import gmrf_3d
    from parmgmc_tpu.samplers.gibbs import GibbsSampler
    from parmgmc_tpu.samplers.mgmc import build_hierarchy

    op = gmrf_3d(16, kappa=1.3, dtype=jnp.float32)
    ops, transfers = build_hierarchy(op, n_levels=4, coarsening="aggregate")
    shapes = tuple(tuple(o.grid_shape) for o in ops[1:])  # tail from level 1
    S1 = shapes[0][1]
    rs = np.random.RandomState(1)
    bl = jnp.asarray(rs.randn(*shapes[0]), jnp.float32)
    f0 = 128 // shapes[0][2]
    bl_layout = jnp.broadcast_to(bl[..., None], (*bl.shape, f0)).reshape(
        shapes[0][0], S1, 128
    )
    smoothers = [
        GibbsSampler.create(o, omega=1.0, sweep="forward", impl="lax")
        for o in ops[1:-1]
    ]
    params = []
    for s in smoothers:
        assert s.fd_params is not None
        params += [1.0, float(s.fd_params[0]), float(s.fd_params[1])]

    ys_k, rhs_k = fused_tail_down(
        bl_layout, jnp.asarray(params, jnp.float32), 0, 0, 0, shapes,
        with_noise=False, interpret=True,
    )

    cur = bl
    for li, s in enumerate(smoothers):
        zero_noise = [{"eta": jnp.zeros(s.grid_shape, jnp.float32)}]
        y_ref = s.step_with_noise(jnp.zeros_like(cur), cur, zero_noise)
        n0, n1, n2 = shapes[li]
        g, f = S1 // n1, 128 // n2
        y_got = ys_k[li][:, ::g, ::f]
        scale = float(jnp.abs(y_ref).max()) + 1e-30
        assert float(jnp.abs(y_got - y_ref).max()) / scale < 1e-5, li
        cur = transfers[1 + li].restrict(cur - ops[1 + li].apply(y_ref))
    n0c, n1c, n2c = shapes[-1]
    rhs_got = rhs_k[:, :: S1 // n1c, :: 128 // n2c]
    scale = float(jnp.abs(cur).max()) + 1e-30
    assert float(jnp.abs(rhs_got - cur).max()) / scale < 1e-4


def test_tail_fused_cycle_integration():
    """_tail_fused_eligible gates correctly and _fused_tail_cycle is a
    deterministic keyed map with the right output shape (CPU interpret;
    the distributional check is the TPU selftest)."""
    from parmgmc_tpu.models.problems import gmrf_3d
    from parmgmc_tpu.samplers.mgmc import MGMCSampler

    op = gmrf_3d(16, kappa=1.0, dtype=jnp.float32)

    smp = MGMCSampler.create(
        op, n_pre=1, n_post=0, coarsest_size=16, coarsening="aggregate",
        impl="lax",
    )
    assert not smp._tail_fused_eligible(1)  # lax => sharded-safe: no tail

    # a (16,16,128) grid admits impl="fused_fd" at level 0 even on CPU
    from parmgmc_tpu.operators.stencil import shifted_laplace_fd

    op2 = shifted_laplace_fd((16, 16, 128), 1.0, dtype=jnp.float32)
    smp2 = MGMCSampler.create(
        op2, n_pre=1, n_post=0, coarsest_size=128, coarsening="aggregate",
        impl="fused_fd",
    )
    assert smp2._tail_fused_eligible(1), [
        (s.impl, s.fd_params is not None) for s in smp2.smoothers
    ]
    bl = jnp.asarray(
        np.random.RandomState(2).randn(8, 8, 64), jnp.float32
    )
    key = jax.random.PRNGKey(5)
    z1 = smp2._fused_tail_cycle(1, bl, key)
    z2 = smp2._fused_tail_cycle(1, bl, key)
    assert z1.shape == (8, 8, 64)
    assert bool(jnp.all(z1 == z2))
    assert bool(jnp.all(jnp.isfinite(z1)))
    # different key => different stochastic correction
    z3 = smp2._fused_tail_cycle(1, bl, jax.random.PRNGKey(6))
    assert not bool(jnp.all(z1 == z3))

    # symmetric sweeps are two half-sweeps — the single-colour tail
    # kernel must refuse them (it would silently halve the smoothing)
    smp4 = MGMCSampler.create(
        op2, n_pre=1, n_post=0, coarsest_size=128,
        coarsening="aggregate", impl="fused_fd", sweep="symmetric",
    )
    assert not smp4._tail_fused_eligible(1)
