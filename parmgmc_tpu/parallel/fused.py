"""Sharded MGMC with per-shard fused Pallas sweeps.

The GSPMD path (parallel.mesh.shard_sampler) must downgrade fused
smoothers to lax sweeps because a Pallas kernel has whole-array
semantics and cannot be partitioned by the compiler.  The reference
has no such penalty: its optimized CSR sweep runs unchanged under MPI
with per-colour VecScatter ghost gathers bolted on
(``/root/reference/src/mc_sor.c:316-341``).  This module is the
TPU-native equivalent for the multigrid sampler: ONE ``shard_map``
spans the whole chain step, halos move by explicit ``ppermute``, and
each shard runs the same fused kernels the single-chip path uses —
masks, red/black colouring, the FD diagonal and the on-chip noise
stream are all keyed by GLOBAL row (``row_offset``/``n0_global`` in
kernels.rb_gibbs / kernels.mg_sweep), so halo rows recomputed on two
shards are bit-identical and the sharded sweep applies the exact
single-device iteration operator.

Layout (grid axis 0 sharded over one mesh axis):

* fine levels: 2-plane halo exchange of the level RHS, then the fused
  from-zero down-phase kernel on the halo-extended local block
  (pre-smooth + residual + restriction in one launch; restriction is
  local because even local row counts keep 2x2x2 aggregates inside one
  shard);
* coarse levels below ``min_local`` rows/shard: the level RHS is
  all-gathered (tiny) and every shard runs the remaining cycle
  redundantly with identical replicated noise — the analogue of the
  reference coarsening onto rank 0 (``src/pc_chols.c:38-47``, SURVEY
  §2.3 item 5) without the idle ranks;
* up-phase: piecewise-constant prolongation is shard-local.

Requirements (asserted): V(1,0) cycles (n_pre=1, n_post=0, gamma=1),
aggregation hierarchy in FD form — the flagship configuration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from parmgmc_tpu.kernels.rb_gibbs import _PLANE_LIMIT
from parmgmc_tpu.operators.transfer import AggregateTransfer
from parmgmc_tpu.samplers.gibbs import _draw
from parmgmc_tpu.samplers.mgmc import MGMCSampler

__all__ = ["make_sharded_mgmc_step", "sharded_fused_gibbs_sweep"]


def _exchange_planes(v_loc, axis_name, h):
    """(lo, hi): h boundary planes from each axis-0 neighbour shard;
    zeros at the chain ends (the global zero-padding boundary)."""
    n_dev = jax.lax.axis_size(axis_name)
    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i + 1, i) for i in range(n_dev - 1)]
    lo = jax.lax.ppermute(v_loc[-h:], axis_name, fwd)
    hi = jax.lax.ppermute(v_loc[:h], axis_name, bwd)
    return lo, hi


def _extend(v_loc, axis_name, h):
    lo, hi = _exchange_planes(v_loc, axis_name, h)
    return jnp.concatenate([lo, v_loc, hi], axis=0)


def sharded_fused_gibbs_sweep(
    x_loc,
    b_loc,
    coeffs,
    kappa2,
    hinv2,
    omega,
    seed,
    step,
    axis_name: str,
    n0_global: int,
    sweep: str = "forward",
    noise_mult=1.0,
    interpret: bool = False,
    with_noise: bool = True,
):
    """One fused x-carrying Gibbs sweep on the local block inside
    shard_map: exchange 2 planes of x and b, run the pipelined kernel on
    the extended block with global-row keying, keep the interior.

    Exactness: a kept row's black update reads the red-updated halo row,
    which this shard recomputes from pre-sweep x at distance <= 2 and
    the (globally keyed) b~ — the identical values the owning shard
    computes, so the result equals the single-device red/black sweep.
    """
    from parmgmc_tpu.kernels.rb_gibbs import fused_rb_gibbs_sweep_fd

    dev = jax.lax.axis_index(axis_name)
    n_loc = x_loc.shape[0]
    x_ext = _extend(x_loc, axis_name, 2)
    b_ext = _extend(b_loc, axis_name, 2)
    row0 = dev * n_loc - 2  # global row of x_ext[0]
    y = fused_rb_gibbs_sweep_fd(
        x_ext,
        b_ext,
        coeffs,
        kappa2,
        hinv2,
        omega,
        seed,
        step,
        noise_mult=noise_mult,
        sweep=sweep,
        interpret=interpret,
        with_noise=with_noise,
        row_offset=row0,
        n0_global=n0_global,
    )
    return y[2:-2]


def _sharded_zero_down(
    bl_loc,
    coeffs,
    kappa2,
    hinv2,
    omega,
    seed,
    step,
    axis_name,
    n0_global,
    sweep,
    interpret,
    with_noise,
):
    """(y_loc, rc_loc): fused from-zero down-phase on the local block.

    Only the level RHS needs halos (the pre-smooth starts from zero), so
    one 2-plane exchange feeds pre-smooth + residual + restriction."""
    from parmgmc_tpu.kernels.mg_sweep import fused_zero_gibbs_restrict_fd

    dev = jax.lax.axis_index(axis_name)
    n_loc = bl_loc.shape[0]
    b_ext = _extend(bl_loc, axis_name, 2)
    row0 = dev * n_loc - 2
    y, rq = fused_zero_gibbs_restrict_fd(
        b_ext,
        coeffs,
        kappa2,
        hinv2,
        omega,
        seed,
        step,
        sweep=sweep,
        interpret=interpret,
        with_noise=with_noise,
        row_offset=row0,
        n0_global=n0_global,
    )
    n1, n2 = bl_loc.shape[1], bl_loc.shape[2]
    # explicit pair add == .sum(-1) bitwise, measured faster
    # (examples/probe_pairsum.py)
    rp = rq[1:-1].reshape(  # drop the two halo rows' coarse images
        n_loc // 2, n1 // 2, n2 // 2, 2
    )
    rc_loc = rp[..., 0] + rp[..., 1]
    return y[2:-2], rc_loc


def _sharded_chain_down(
    x_loc,
    b_loc,
    coeffs,
    kappa2,
    hinv2,
    omega,
    seed,
    step,
    axis_name,
    n0_global,
    sweep,
    interpret,
    with_noise,
):
    """(xpy_loc, rc_loc): fused CHAIN down-phase on the local block —
    residual + noise + from-zero pre-smooth + state add + restriction in
    one launch, like the single-chip path.  The r -> y -> r - A y chain
    consumes three rings, so a 4-plane halo of x and b (even, keeping
    noise pairs and the restriction 2x2x2 blocks globally aligned)
    feeds the kernel; the halo rows' outputs are discarded."""
    from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_fd

    dev = jax.lax.axis_index(axis_name)
    n_loc = x_loc.shape[0]
    x_ext = _extend(x_loc, axis_name, 4)
    b_ext = _extend(b_loc, axis_name, 4)
    row0 = dev * n_loc - 4
    xpy, rq = fused_chain_down_fd(
        x_ext,
        b_ext,
        coeffs,
        kappa2,
        hinv2,
        omega,
        seed,
        step,
        sweep=sweep,
        interpret=interpret,
        with_noise=with_noise,
        row_offset=row0,
        n0_global=n0_global,
    )
    n1, n2 = x_loc.shape[1], x_loc.shape[2]
    # explicit pair add == .sum(-1) bitwise, measured faster
    # (examples/probe_pairsum.py)
    rp = rq[2:-2].reshape(  # drop the four halo rows' coarse images
        n_loc // 2, n1 // 2, n2 // 2, 2
    )
    rc_loc = rp[..., 0] + rp[..., 1]
    return xpy[4:-4], rc_loc


def _local_fd_apply(x_loc, lo1, hi1, coeffs, kappa2, hinv2, row0, n0_global):
    """(A x)|local rows for the FD star operator, given 1-plane halos.

    Off-diagonal contributions use zero halos at the global ends (the
    FD zero-padding boundary); the diagonal is recomputed from the
    link-count formula with GLOBAL row masks."""
    n_loc, n1, n2 = x_loc.shape
    xp = jnp.concatenate([lo1, x_loc, hi1], axis=0)
    up, dn = xp[:-2], xp[2:]

    def shift(a, axis, by):
        pads = [(0, 0)] * a.ndim
        pads[axis] = (max(0, -by), max(0, by))
        ap = jnp.pad(a, pads)
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(max(0, by), max(0, by) + a.shape[axis])
        return ap[tuple(sl)]

    gg = row0 + jax.lax.broadcasted_iota(jnp.int32, x_loc.shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, x_loc.shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, x_loc.shape, 2)
    links = (
        (gg >= 1).astype(x_loc.dtype)
        + (gg <= n0_global - 2).astype(x_loc.dtype)
        + (jj >= 1).astype(x_loc.dtype)
        + (jj <= n1 - 2).astype(x_loc.dtype)
        + (kk >= 1).astype(x_loc.dtype)
        + (kk <= n2 - 2).astype(x_loc.dtype)
    )
    diag = kappa2 + hinv2 * links
    return (
        diag * x_loc
        + coeffs[0] * up
        + coeffs[1] * dn
        + coeffs[2] * shift(x_loc, 1, -1)
        + coeffs[3] * shift(x_loc, 1, 1)
        + coeffs[4] * shift(x_loc, 2, -1)
        + coeffs[5] * shift(x_loc, 2, 1)
    )


def _level_shardable(sampler, l, n_dev, min_local):
    from parmgmc_tpu.kernels.mg_sweep import chain_down_2d_supported

    op = sampler.ops[l]
    s = sampler.smoothers[l]
    n0, n1, n2 = op.grid_shape
    return (
        s.fd_params is not None
        # fd_params alone no longer implies kernel compatibility (it is
        # recorded for lax smoothers too, for the MGMC tail gate) — the
        # Pallas chain kernels are f32-only
        and op.dtype == jnp.float32
        and isinstance(sampler.transfers[l], AggregateTransfer)
        and n0 % n_dev == 0
        and (n0 // n_dev) % 4 == 0
        and n0 // n_dev >= min_local
        and n1 % 2 == 0
        and n2 % 2 == 0
        and n2 % 128 == 0
        # levels >= 1 run the whole-plane zero-down kernel; level 0 runs
        # the chain kernel, whose 2D-tiled variant admits bigger planes
        # (the local block it sees carries a 4-plane halo each side)
        and (
            n1 * n2 <= _PLANE_LIMIT
            if l > 0
            else (
                n1 * n2 <= _PLANE_LIMIT
                or chain_down_2d_supported((n0 // n_dev + 8, n1, n2))
            )
        )
    )


def _tail_shapes(sampler, l):
    if l == sampler.n_levels - 1:
        return [sampler.coarse.noise_shapes() for _ in range(sampler.n_coarse)]
    s = sampler.smoothers[l]
    return {
        "pre": [s.noise_shapes() for _ in range(sampler.n_pre)],
        "sub": [_tail_shapes(sampler, l + 1)],
        "post": [s.noise_shapes() for _ in range(sampler.n_post)],
    }


def make_sharded_mgmc_step(
    sampler: MGMCSampler,
    mesh: Mesh,
    axis_name: str = "x",
    min_local: int = 8,
    interpret: bool = False,
    with_noise: bool = True,
):
    """(step, state_sharding): a jitted sharded MGMC chain step.

    step(key, x, b) -> (key, x') with x/b sharded along grid axis 0 over
    ``mesh.shape[axis_name]`` devices.  ``with_noise=False`` gives the
    deterministic multigrid iteration (used by the exact sharded ==
    single-device parity tests; the on-chip PRNG cannot run in CPU
    interpret mode).

    LRC (posterior) fine operators are supported: the level-0 kernel
    runs UNCHANGED on the base stencil (the single-chip
    ``_lrc_chain_step`` recipe distributed), with the rank-k products
    as shard-local contractions + one ``psum`` each — B, Bb, RABb and
    B_c ride as runtime ARGUMENTS sharded along grid axis 0 (never
    closure constants; remote compile rejects big constants).  The
    replicated tail below ``n_sh`` runs the sampler's own lax LRC
    machinery.  Dense contractions only (the patch view's global
    starts don't shard); fine for the multi-chip regime where the
    rank-k work is 1/n_dev per shard.
    """
    assert sampler.n_pre == 1 and sampler.n_post == 0 and sampler.gamma == 1, (
        "sharded fused MGMC supports the V(1,0) flagship configuration"
    )
    from parmgmc_tpu.operators.lrc import LRCOperator

    is_lrc = isinstance(sampler.ops[0], LRCOperator)
    if is_lrc:
        assert sampler.lrc_aux is not None, (
            "sharded LRC needs the rank-k aux matrices (compute_lrc_aux: "
            "fused_fd level-0 smoother, forward/backward sweep)"
        )
    n_dev = mesh.shape[axis_name]
    n_sh = 0
    while n_sh < sampler.n_levels - 1 and _level_shardable(
        sampler, n_sh, n_dev, min_local
    ):
        n_sh += 1
    if is_lrc:
        # only level 0 carries the rank-k correction machinery (as on a
        # single chip); deeper levels run exact lax LRC in the tail
        n_sh = min(n_sh, 1)
    if n_sh == 0:
        raise ValueError(
            f"fine level {sampler.ops[0].grid_shape} not shardable over "
            f"{n_dev} devices (needs rows % (4*{n_dev}) == 0, FD form, "
            "aggregation transfers, lane dim % 128)"
        )

    # Per sharded level: scalars only (no grid-shaped closure constants).
    lvl = []
    for l in range(n_sh):
        s = sampler.smoothers[l]
        lvl.append(
            dict(
                coeffs=s._coeff6(),
                kappa2=s.fd_params[0],
                hinv2=s.fd_params[1],
                omega=s.omega.astype(jnp.float32),
                sweep=s.sweep,
                n0_global=int(sampler.ops[l].grid_shape[0]),
                local_shape=(
                    sampler.ops[l].grid_shape[0] // n_dev,
                    *sampler.ops[l].grid_shape[1:],
                ),
            )
        )
    tail_shapes = _tail_shapes(sampler, n_sh)
    dtype = sampler.dtype

    def _cycle_tail(l, bl, noises):
        """Replicated cycle from level l (sampler's lax machinery)."""
        if l == sampler.n_levels - 1:
            z = jnp.zeros_like(bl)
            for i in range(sampler.n_coarse):
                z = sampler.coarse.step_with_noise(z, bl, noises[i])
            return z
        op = sampler.ops[l]
        s = sampler.smoothers[l]
        z = jnp.zeros_like(bl)
        for i in range(sampler.n_pre):
            z = s.step_with_noise(z, bl, noises["pre"][i])
        r = sampler.transfers[l].restrict(bl - op.apply(z))
        zc = _cycle_tail(l + 1, r, noises["sub"][0])
        z = z + sampler.transfers[l].prolong(zc)
        for i in range(sampler.n_post):
            z = s.step_with_noise(z, bl, noises["post"][i])
        return z

    spec = P(axis_name, None, None)
    spec4 = P(axis_name, None, None, None)
    state_sharding = NamedSharding(mesh, spec)
    ax3 = (0, 1, 2)

    def _body(seeds, noises, lrc_in, x_loc, b_loc):
        dev = jax.lax.axis_index(axis_name)
        p0 = lvl[0]

        if is_lrc:
            # rank-k posterior terms: shard-local contractions + one
            # psum each (the single-chip _lrc_chain_step distributed)
            w, sig_inv, H, B_l, Bb_l, RABb_l, Bc_l = lrc_in
            btx = jax.lax.psum(
                jnp.tensordot(B_l, x_loc, axes=(ax3, ax3)), axis_name
            )
            b_loc = b_loc + jnp.tensordot(
                B_l, w - sig_inv * btx, axes=((3,), (0,))
            )

        # level 0: the CHAIN kernel fuses residual + noise + pre-smooth
        # + state add + restriction (single-chip parity — the separate
        # lax residual program and final three-array add are gone)
        xpy, bl = _sharded_chain_down(
            x_loc,
            b_loc,
            p0["coeffs"],
            p0["kappa2"],
            p0["hinv2"],
            p0["omega"],
            seeds[0, 0],
            seeds[0, 1],
            axis_name,
            p0["n0_global"],
            p0["sweep"],
            interpret,
            with_noise,
        )

        if is_lrc:
            # corrections to the kernel's restricted residual + the
            # Woodbury state correction (deferred into the final add)
            c = (
                jax.lax.psum(
                    jnp.tensordot(B_l, xpy, axes=(ax3, ax3)), axis_name
                )
                - btx
            )
            cc = w + sig_inv * (c - H @ c)
            bl = (
                bl
                + jnp.tensordot(RABb_l, c, axes=((3,), (0,)))
                - jnp.tensordot(Bc_l, cc, axes=((3,), (0,)))
            )
            xpy = xpy - jnp.tensordot(Bb_l, c, axes=((3,), (0,)))

        # down the remaining sharded levels (from-zero kernel)
        ys = []
        for l in range(1, n_sh):
            p = lvl[l]
            y, bl = _sharded_zero_down(
                bl,
                p["coeffs"],
                p["kappa2"],
                p["hinv2"],
                p["omega"],
                seeds[l, 0],
                seeds[l, 1],
                axis_name,
                p["n0_global"],
                p["sweep"],
                interpret,
                with_noise,
            )
            ys.append(y)

        # replicated tail: gather the (tiny) level-n_sh RHS, every shard
        # redundantly runs the rest of the cycle with identical noise
        bl_full = jax.lax.all_gather(bl, axis_name, axis=0, tiled=True)
        z = _cycle_tail(n_sh, bl_full, noises)
        rows = bl.shape[0]
        z = jax.lax.dynamic_slice_in_dim(z, dev * rows, rows, axis=0)

        # up: piecewise-constant prolongation is shard-local
        for l in reversed(range(1, n_sh)):
            z = ys[l - 1] + AggregateTransfer(
                fine_shape=lvl[l]["local_shape"]
            ).prolong(z)
        return xpy + AggregateTransfer(
            fine_shape=lvl[0]["local_shape"]
        ).prolong(z)

    if is_lrc:
        op0 = sampler.ops[0]
        s0 = sampler.smoothers[0]
        Bb0 = s0.Bb_fw if s0.sweep == "forward" else s0.Bb_bw
        # runtime ARGUMENTS, sharded along grid axis 0 (k trails)
        lrc_consts = (
            op0.sigma_inv,
            sampler.lrc_aux["H"],
            op0.B,
            Bb0,
            sampler.lrc_aux["RABb"],
            sampler.ops[1].B,
        )
        k_lr = op0.k
        lrc_specs = (P(), P(), P(), spec4, spec4, spec4, spec4)
    else:
        lrc_consts = None
        lrc_specs = ()

    body_sh = jax.shard_map(
        _body,
        mesh=mesh,
        in_specs=(P(), P(), lrc_specs, spec, spec),
        out_specs=spec,
        check_vma=False,  # pallas_call out_shapes carry no vma
    )

    @jax.jit
    def _step(key, x, b, consts):
        key, ks, kn, kw = jax.random.split(key, 4)
        seeds = jax.random.randint(
            ks, (n_sh, 2), 0, 2**31 - 1, dtype=jnp.int32
        )
        if with_noise:
            noises = _draw(kn, tail_shapes, dtype)
        else:
            noises = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s, dtype),
                tail_shapes,
                is_leaf=lambda s: isinstance(s, tuple),
            )
        if is_lrc:
            sig_inv, H, B, Bb, RABb, Bc = consts
            if with_noise:
                w = jnp.sqrt(sig_inv) * jax.random.normal(kw, (k_lr,), dtype)
            else:
                w = jnp.zeros((k_lr,), dtype)
            lrc_in = (w, sig_inv, H, B, Bb, RABb, Bc)
        else:
            lrc_in = ()
        return key, body_sh(seeds, noises, lrc_in, x, b)

    def step(key, x, b):
        return _step(key, x, b, lrc_consts)

    return step, state_sharding
