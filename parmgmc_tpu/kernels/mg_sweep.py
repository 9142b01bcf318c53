"""Fused MGMC down-phase kernel: noise + from-zero sweep + residual + restrict.

The V-cycle's per-level down-phase work is, in lax ops, four separate
HBM-bound programs (stochastic RHS build, masked two-colour sweep,
residual, restriction — the reference's hot path spreads the same work
across MCSORApply + MatMult + MatRestrict, ``/root/reference/src/
mc_sor.c:298-381``, ``src/pc_gamgmc.c:227-264``).  On TPU each extra
pass costs a full HBM round trip, so this kernel fuses the whole
down-phase of one level into a single software-pipelined ``pallas_call``:

  1. stream the level RHS ``bl`` block by block (every byte fetched once),
  2. build the stochastic RHS b~ = bl + sqrt((2-w)/w) D^{1/2} eta with
     eta generated on chip, keyed by (seed, step, global row) — identical
     keying to kernels.rb_gibbs, so halo recompute across tiles/shards
     stays bit-identical,
  3. run one red/black SOR sweep FROM ZERO (the MGMC pre-smooth; no x
     stream at all — colour-0 values are (w/D) b~ everywhere),
  4. compute the post-sweep residual r = bl - A y on the tile's rows and
     restrict it by the 2x2x2 aggregate sum in axis 0 (row-pair adds)
     and axis 1 (sublane reshape-sum).  The lane-dim pair sum is left to
     one cheap XLA op (Mosaic has no exact lane-pair reduction; the MXU
     matmul route loses f32 precision, which would break the exact
     Galerkin identity the invariance tests depend on).

Outputs: y (the smoothed correction) and rq of shape (N0/2, N1/2, N2)
with ``rc = rq.reshape(N0/2, N1/2, N2/2, 2).sum(-1)``.

HBM traffic per level: read bl + write y + write rq = 2.25 passes,
replacing ~7 passes of the unfused path.  FD-form operators only (the
diagonal is recomputed in-kernel from the link-count formula); the
plain-aggregation hierarchy keeps every level in FD form, so this
kernel serves the whole cycle above the lane-width floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parmgmc_tpu.kernels.rb_gibbs import (
    _JB as _JB2,
    _auto_tile,
    _compiler_params,
    _eta_pair,
    _eta_pair_blk,
    _mix,
    _shift_plane,
)

__all__ = [
    "fused_zero_gibbs_restrict_fd",
    "fused_chain_down_fd",
    "fused_chain_down_2d",
    "fused_chain_down_2d_staged",
]

_TWO_PI = 6.283185307179586


def _kernel(
    fscal_ref,  # SMEM (10,) f32: omega, c0lo..c2hi, noise_mult, kappa2, hinv2
    iscal_ref,  # SMEM (4,) i32: seed, color0, step, row_off
    b_ref,  # VMEM (T, N1, N2) block min(i, G-1) of bl
    y_ref,  # VMEM (T, N1, N2) out block max(i-1, 0)
    rq_ref,  # VMEM (T//2, N1//2, N2) out block max(i-1, 0)
    btw,  # scratch (T+4, N1, N2): b~ rows jT-2 .. jT+T+1
    btprev,  # scratch (T, N1, N2): b~ rows jT .. jT+T-1 (from last step)
    braw,  # scratch (T, N1, N2): raw bl rows jT .. jT+T-1
    tail_bt,  # scratch (2, N1, N2): b~ rows jT-2, jT-1
    yw,  # scratch (T+4, N1, N2): the from-zero sweep window
    *,
    T: int,
    shape: tuple,
    with_noise: bool,
    n0_global: int,
):
    # Global-row masking/keying: gg = g + row_off vs n0_global (see
    # kernels.rb_gibbs._kernel_v2) — lets shard_map callers run the
    # down-phase on halo-extended local blocks.
    N0, N1, N2 = shape
    N0G = n0_global
    G = N0 // T
    W = T + 4
    i = pl.program_id(0)
    j = i - 1  # tile being produced
    jT = j * T

    omega = fscal_ref[0]
    noise_mult = fscal_ref[7]
    kappa2 = fscal_ref[8]
    hinv2 = fscal_ref[9]
    seed = iscal_ref[0]
    color0 = iscal_ref[1]
    step = iscal_ref[2]
    row_off = iscal_ref[3]
    su = seed.astype(jnp.uint32)
    stepu = step.astype(jnp.uint32)
    nscale = jnp.sqrt((2.0 - omega) / omega) * noise_mult

    jj = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 1)
    plane_par = (jj + kk) % 2
    links_inplane = (
        (jj >= 1).astype(jnp.float32)
        + (jj <= N1 - 2).astype(jnp.float32)
        + (kk >= 1).astype(jnp.float32)
        + (kk <= N2 - 2).astype(jnp.float32)
    )

    c0lo, c0hi = fscal_ref[1], fscal_ref[2]
    c1lo, c1hi = fscal_ref[3], fscal_ref[4]
    c2lo, c2hi = fscal_ref[5], fscal_ref[6]

    def diag_row(g):
        gg = g + row_off
        up_ok = (gg >= 1).astype(jnp.float32)
        dn_ok = (gg <= N0G - 2).astype(jnp.float32)
        return kappa2 + hinv2 * (links_inplane + up_ok + dn_ok)

    # ---- whole-window helpers (rows within a red/black phase are
    # independent, so each phase is ONE vector op over the (W, N1, N2)
    # window instead of a row loop — Mosaic vectorises the sublane dim
    # and the per-row loop overhead disappears) ------------------------
    ll3 = jax.lax.broadcasted_iota(jnp.int32, (W, N1, N2), 0)

    def window_geom():
        """(par3, diag3, up_ok3, dn_ok3) for window rows jT-2..jT+T+1."""
        gg3 = (jT - 2 + row_off) + ll3
        # jT - 2 + row_off is even (T and row_off even), so the colour
        # code reduces to (ll + plane parity) — cheap and j-independent
        par3 = (ll3 + plane_par[None]) % 2
        up_ok3 = (gg3 >= 1).astype(jnp.float32)
        dn_ok3 = (gg3 <= N0G - 2).astype(jnp.float32)
        diag3 = kappa2 + hinv2 * (links_inplane[None] + up_ok3 + dn_ok3)
        return par3, diag3, up_ok3, dn_ok3

    def neigh_sum(v3, up_ok3, dn_ok3):
        """sum of off-diagonal neighbour contributions, whole window.
        Window-edge rows see zero-filled axis-0 neighbours — their
        values are never read downstream (rows 0 / W-1 are halo)."""
        return (
            c0lo * up_ok3 * _shift_plane(v3, 0, -1, W)
            + c0hi * dn_ok3 * _shift_plane(v3, 0, 1, W)
            + c1lo * _shift_plane(v3, 1, -1, N1)
            + c1hi * _shift_plane(v3, 1, 1, N1)
            + c2lo * _shift_plane(v3, 2, -1, N2)
            + c2hi * _shift_plane(v3, 2, 1, N2)
        )

    @pl.when(i > 0)
    def _compute():
        # ---- assemble the b~ window rows jT-2 .. jT+T+1 ------------------
        btw[0] = tail_bt[0]
        btw[1] = tail_bt[1]
        btw[pl.ds(2, T)] = btprev[:]
        # rows jT+T, jT+T+1 come fresh from the current block (recomputed
        # bit-identically in next step's slide); they form an aligned
        # pair, so one Box-Muller evaluation serves both
        if with_noise:
            ee, eo = _eta_pair(su, stepu, jT + T + row_off, N1, N2)
            btw[T + 2] = (
                b_ref[0] + nscale * jnp.sqrt(diag_row(jT + T)) * ee
            )
            btw[T + 3] = (
                b_ref[jnp.minimum(1, T - 1)]
                + nscale * jnp.sqrt(diag_row(jT + T + 1)) * eo
            )
            if T >= 4:
                # rows jT+T, jT+T+1 are exactly _slide's pair 0 for the
                # block slid this grid step (g = iT): store them so the
                # Box-Muller pair is not re-evaluated there.  T >= 4
                # keeps the store clear of _slide_tails' reads of rows
                # T-2, T-1.
                btprev[0] = btw[T + 2]
                btprev[1] = btw[T + 3]
        else:
            btw[T + 2] = b_ref[0]
            btw[T + 3] = b_ref[jnp.minimum(1, T - 1)]

        par3, diag3, up_ok3, dn_ok3 = window_geom()
        winv3 = omega / diag3
        bt3 = btw[:]

        # ---- phase 0: from zero, y = (w/D) b~ at colour-0 points ---------
        yw[:] = jnp.where(par3 == color0, winv3 * bt3, 0.0)

        # ---- phase 1: colour-1 points read fresh colour-0 neighbours -----
        y0 = yw[:]
        upd3 = winv3 * (bt3 - neigh_sum(y0, up_ok3, dn_ok3))
        yw[:] = jnp.where(par3 == (1 - color0), upd3, y0)

        yf = yw[:]
        y_ref[:] = yf[2 : T + 2]

        # ---- residual + 3/4-restriction ----------------------------------
        # r = bl - A y on output rows; coarse row c sums fine rows
        # 2c, 2c+1 (axis 0) and sublane pairs (axis 1).
        r3 = (
            braw[:]
            - (diag3 * yf + neigh_sum(yf, up_ok3, dn_ok3))[2 : T + 2]
        )

        # static unroll: Mosaic has no dynamic_slice on values, and T is
        # a compile-time constant anyway
        for c in range(T // 2):
            rp = r3[2 * c] + r3[2 * c + 1]
            rq_ref[c] = rp.reshape(N1 // 2, 2, N2).sum(1)

    @pl.when(i == 0)
    def _init():
        tail_bt[0] = jnp.zeros((N1, N2), jnp.float32)
        tail_bt[1] = jnp.zeros((N1, N2), jnp.float32)
        y_ref[:] = b_ref[:]  # overwritten at step 1
        rq_ref[:] = jnp.zeros((T // 2, N1 // 2, N2), jnp.float32)

    @pl.when(jnp.logical_and(i > 0, i < G))
    def _slide_tails():
        tail_bt[0] = btprev[T - 2]
        tail_bt[1] = btprev[T - 1]

    @pl.when(i < G)
    def _slide():
        braw[:] = b_ref[:]

        def brow(c, _):
            r = 2 * c
            g = i * T + r
            if with_noise:
                ee, eo = _eta_pair(su, stepu, g + row_off, N1, N2)
                btprev[r] = b_ref[r] + nscale * jnp.sqrt(diag_row(g)) * ee
                btprev[r + 1] = (
                    b_ref[r + 1] + nscale * jnp.sqrt(diag_row(g + 1)) * eo
                )
            else:
                btprev[r] = b_ref[r]
                btprev[r + 1] = b_ref[r + 1]
            return 0

        if with_noise and T >= 4:
            # pair 0 was stored by _compute this grid step; only tile 0
            # (no compute ran) generates it here
            start = jnp.where(i > 0, 1, 0)
        else:
            start = 0
        jax.lax.fori_loop(start, T // 2, brow, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("sweep", "tile", "interpret", "with_noise", "n0_global"),
)
def fused_zero_gibbs_restrict_fd(
    b,
    coeffs,  # (6,) f32: axis0 lo/hi, axis1 lo/hi, axis2 lo/hi
    kappa2,
    hinv2,
    omega,
    seed,  # int32 scalar
    step,  # int32 scalar
    noise_mult=1.0,
    sweep: str = "forward",
    tile: "int | None" = None,
    interpret: bool = False,
    with_noise: bool = True,
    row_offset=0,  # global row of array row 0 (traced; shard_map use)
    n0_global: "int | None" = None,  # global grid extent for masks
):
    """(y, rq): fused stochastic from-zero sweep + restricted residual.

    y = one red/black SOR sweep from zero initial guess applied to
    b~ = b + noise; rq = the 2x2x2-aggregate restriction of b - A y with
    the lane-dim pair sum still open:
    ``rc = rq.reshape(n0/2, n1/2, n2/2, 2).sum(-1)``.

    ``row_offset``/``n0_global`` let a shard_map caller run the
    down-phase on a halo-extended local block with masks, colouring and
    noise keyed by GLOBAL row — see parallel.fused.
    """
    N0, N1, N2 = b.shape
    if n0_global is None:
        n0_global = N0
    # VMEM planes: scratch 4T+10 + b/y blocks 4T + rq blocks T/2 + the
    # whole-window phase temporaries (y0/upd3/r3/neigh shifts ~ 6 windows)
    T = _auto_tile(N0, N1 * N2 * 4, 15, 22, tile, t_min=2)
    if tile is None:
        # Mosaic compile time explodes on (T+4)-plane vector ops past
        # T=16 (measured: T=32 at 128^2 planes never finishes)
        while T and T > 16:
            T //= 2
    while T and (N0 % T or N0 < 2 * T or T % 2):
        T //= 2
    if not T:
        raise ValueError(f"grid dim {N0} unsupported")
    if N0 % 2 or N1 % 2 or N2 % 2:
        raise ValueError("restriction needs even dims")
    G = N0 // T
    color0 = 0 if sweep == "forward" else 1

    fscal = jnp.concatenate(
        [
            jnp.asarray([omega], jnp.float32),
            jnp.asarray(coeffs, jnp.float32).reshape(6),
            jnp.asarray([noise_mult, kappa2, hinv2], jnp.float32),
        ]
    )
    iscal = jnp.stack(
        [
            jnp.asarray(seed, jnp.int32),
            jnp.asarray(color0, jnp.int32),
            jnp.asarray(step, jnp.int32),
            jnp.asarray(row_offset, jnp.int32),
        ]
    )

    kern = functools.partial(
        _kernel,
        T=T,
        shape=(N0, N1, N2),
        with_noise=with_noise,
        n0_global=n0_global,
    )
    return pl.pallas_call(
        kern,
        grid=(G + 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (T, N1, N2),
                lambda i: (jnp.minimum(i, G - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (T, N1, N2),
                lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (T // 2, N1 // 2, N2),
                lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
            jax.ShapeDtypeStruct((N0 // 2, N1 // 2, N2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((T + 4, N1, N2), jnp.float32),  # btw
            pltpu.VMEM((T, N1, N2), jnp.float32),  # btprev
            pltpu.VMEM((T, N1, N2), jnp.float32),  # braw
            pltpu.VMEM((2, N1, N2), jnp.float32),  # tail_bt
            pltpu.VMEM((T + 4, N1, N2), jnp.float32),  # yw
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(fscal, iscal, b)


# ---------------------------------------------------------------------------
# v2: the CHAIN-LEVEL fused down-phase.
#
# The MGMC chain step is x' = x + M_mg(b - A x).  The v1 kernel above
# still needs the fine-grid residual r = b - A x materialised by a
# separate XLA program (read b + read x + write r = 3 HBM passes) and a
# final three-array add x' = x + y0 + P z1 (another full read of x).
# This kernel absorbs both into the level-0 down-phase: it streams x and
# b once and
#
#   1. recomputes r = b - A x row by row inside the sliding window,
#   2. builds the stochastic RHS r~ = r + sqrt((2-w)/w) D^{1/2} eta
#      (noise keyed by (seed, step, global row) as everywhere else),
#   3. runs the from-zero red/black pre-smooth IN PLACE in the r~ buffer
#      (colour-0 cells hold y after phase 0, colour-1 cells still hold
#      r~ until phase 1 overwrites them — neighbour reads always land on
#      the opposite colour, so one buffer serves both phases),
#   4. emits xpy = x + y0 (the fused state add) and the aggregate-
#      restricted residual of (r - A y0), lane pair-sum left to XLA.
#
# Per chain step the level-0 HBM traffic becomes read x + read b +
# write xpy + write rq = 3.125 passes, replacing the unfused path's
# 3 (residual) + 2.125 (v1 down) + 1 extra read in the final add =
# 6.125 passes, and two XLA program launches disappear.
# ---------------------------------------------------------------------------


def _kernel_chain(
    fscal_ref,  # SMEM (10,) f32: omega, c0lo..c2hi, noise_mult, kappa2, hinv2
    iscal_ref,  # SMEM (4,) i32: seed, color0, step, row_off
    *refs,
    T: int,
    shape: tuple,
    with_noise: bool,
    n0_global: int,
    with_z: bool = False,
    with_xsum: bool = False,
    with_zsum: bool = False,
    with_b: bool = True,
):
    """Staged-slab chain down-phase (see fused_chain_down_fd).

    Ref layout (after the two SMEM scalars), in pallas_call order:

    inputs   x_ref, [b_ref]   (T, N1, N2) blocks min(i, G-1) of the chain
                              state x and RHS b.  ``with_b=False`` (prior
                              sampling, b == 0) drops the b stream and
                              its bprev slide entirely — every ``b - ...``
                              term becomes ``0.0 - ...``, so results stay
                              bit-identical to streaming explicit zeros
             [zx2_ref]        (T//2, N1//2, N2) block min(i, G-1): the
                              PREVIOUS step's coarse correction with lanes
                              pre-duplicated — when with_z, the chain
                              state is x = x_ref + P zx2 and the
                              prolong-add is DEFERRED into this kernel
                              (x is never materialised in HBM)
    outputs  xpy_ref          (T, N1, N2) out block max(i-1, 0): x + y0
             rq_ref           (T//2, N1//2, N2) out block max(i-1, 0)
             [xsum_ref]       (T, 1, N2) out block: xpy summed over axis 1
                              (lets QOI reductions skip the fine grid)
             [zsum_ref]       (1, 1, N2) accumulated sums of the zx2
                              INPUT (= the previous step's correction):
                              the z part of the PREVIOUS sample's global
                              sum, so the chain never re-reads zx2

    Dataflow: instead of recomputing every pipeline stage over a full
    sliding window per tile ((T+6)-row A x, (T+4)-row phases — 3T+12
    stencil rows per T output rows, 2x recompute at the 512^3 tile
    T=4), each stage computes a fresh T-row slab per tile and carries
    the 2 rows the next tile's window needs in rows 0..1 of its own
    (T+2)-row scratch:

      axw   A x  rows jT ..   jT+T+1   (fresh slab rows jT+2 .. jT+T+1)
      y0w   r~/phase-0 rows jT .. jT+T+1  (same fresh rows; in place)
      yw    y    rows jT-1 .. jT+T     (fresh slab rows jT+1 .. jT+T)

    where j = i-1 is the tile being produced.  Every row of every stage
    is computed exactly once (3(T+2) stencil rows per tile) from the
    same formulas in the same order, so results are bit-identical to
    the windowed form; noise keying is unchanged (one Box-Muller pair
    per produced row pair, keyed (seed, step, global even row)).  Tile
    1 additionally computes a tiny prologue (stage rows 0..1 / row 0)
    to prime the carries.
    """
    x_ref = refs[0]
    k = 1
    b_ref = refs[k] if with_b else None
    k += 1 if with_b else 0
    z_ref = refs[k] if with_z else None
    k += 1 if with_z else 0
    xpy_ref, rq_ref = refs[k], refs[k + 1]
    k += 2
    xsum_ref = refs[k] if with_xsum else None
    k += 1 if with_xsum else 0
    zsum_ref = refs[k] if with_zsum else None
    k += 1 if with_zsum else 0
    xw2, axw, y0w, yw, xprev = refs[k : k + 5]
    k += 5
    bprev = refs[k] if with_b else None
    k += 1 if with_b else 0
    prow = refs[k]
    # Global-row masking/keying (gg = g + row_off vs n0_global) lets a
    # shard_map caller run the chain down-phase on halo-extended local
    # blocks — see parallel.fused.
    N0, N1, N2 = shape
    N0G = n0_global
    G = N0 // T
    i = pl.program_id(0)
    j = i - 1  # tile being produced
    jT = j * T

    omega = fscal_ref[0]
    noise_mult = fscal_ref[7]
    kappa2 = fscal_ref[8]
    hinv2 = fscal_ref[9]
    seed = iscal_ref[0]
    color0 = iscal_ref[1]
    step = iscal_ref[2]
    row_off = iscal_ref[3]
    su = seed.astype(jnp.uint32)
    stepu = step.astype(jnp.uint32)
    nscale = jnp.sqrt((2.0 - omega) / omega) * noise_mult

    jj = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 1)
    plane_par = (jj + kk) % 2
    links_inplane = (
        (jj >= 1).astype(jnp.float32)
        + (jj <= N1 - 2).astype(jnp.float32)
        + (kk >= 1).astype(jnp.float32)
        + (kk <= N2 - 2).astype(jnp.float32)
    )

    c0lo, c0hi = fscal_ref[1], fscal_ref[2]
    c1lo, c1hi = fscal_ref[3], fscal_ref[4]
    c2lo, c2hi = fscal_ref[5], fscal_ref[6]

    def diag_row(g):
        gg = g + row_off
        up_ok = (gg >= 1).astype(jnp.float32)
        dn_ok = (gg <= N0G - 2).astype(jnp.float32)
        return kappa2 + hinv2 * (links_inplane + up_ok + dn_ok)

    # ---- whole-window helpers (rows within a red/black phase are
    # independent; all loops except the sequential PRNG pair loop are
    # single vector ops over the window — see _kernel above) -----------
    def geom(w, off):
        """(par3, diag3, up_ok3, dn_ok3) for a w-row window whose row 0
        is global row jT + off + row_off (T and row_off even and off a
        static int, so parity is j-independent)."""
        ll3 = jax.lax.broadcasted_iota(jnp.int32, (w, N1, N2), 0)
        g3 = (jT + off + row_off) + ll3
        par3 = (ll3 + (off % 2) + plane_par[None]) % 2
        up_ok3 = (g3 >= 1).astype(jnp.float32)
        dn_ok3 = (g3 <= N0G - 2).astype(jnp.float32)
        diag3 = kappa2 + hinv2 * (links_inplane[None] + up_ok3 + dn_ok3)
        return par3, diag3, up_ok3, dn_ok3

    def neigh_sum(v3, w, up_ok3, dn_ok3):
        return (
            c0lo * up_ok3 * _shift_plane(v3, 0, -1, w)
            + c0hi * dn_ok3 * _shift_plane(v3, 0, 1, w)
            + c1lo * _shift_plane(v3, 1, -1, N1)
            + c1hi * _shift_plane(v3, 1, 1, N1)
            + c2lo * _shift_plane(v3, 2, -1, N2)
            + c2hi * _shift_plane(v3, 2, 1, N2)
        )

    def zexpand(zblk, rows):
        """(rows//2, N1//2, N2) -> (rows, N1, N2): expand coarse rows x2
        (leading axis) and sublanes x2 (lanes were pre-duplicated by the
        caller)."""
        zr = jnp.broadcast_to(
            zblk[:, None], (rows // 2, 2, N1 // 2, N2)
        ).reshape(rows, N1 // 2, N2)
        return jnp.broadcast_to(
            zr[:, :, None], (rows, N1 // 2, 2, N2)
        ).reshape(rows, N1, N2)

    @pl.when(i == 1)
    def _prologue():
        # Prime the stage carries: A x rows 0..1, r~/phase-0 rows 0..1,
        # y row 0 (plus a zero "row -1" whose contributions are masked
        # by up_ok / discarded by sharded callers).  Same formulas and
        # noise keying as the slabs, so values are bit-identical to a
        # windowed evaluation with zero phantom rows.
        prow[0] = jnp.zeros((N1, N2), jnp.float32)
        prow[1] = xprev[0]
        prow[2] = xprev[1]
        prow[3] = xprev[2]
        _, diag4, up4, dn4 = geom(4, -1)  # rows -1..2 (jT = 0 here)
        pv4 = prow[:]
        axp = diag4 * pv4 + neigh_sum(pv4, 4, up4, dn4)
        axw[0] = axp[1]
        axw[1] = axp[2]
        if with_b:
            rp0 = bprev[0] - axp[1]
            rp1 = bprev[1] - axp[2]
        else:
            rp0 = 0.0 - axp[1]
            rp1 = 0.0 - axp[2]
        if with_noise:
            ee, eo = _eta_pair(su, stepu, row_off, N1, N2)
            rp0 = rp0 + nscale * jnp.sqrt(diag_row(0)) * ee
            rp1 = rp1 + nscale * jnp.sqrt(diag_row(1)) * eo
        d0 = diag_row(0)
        d1 = diag_row(1)
        par1 = (plane_par + 1) % 2
        y0p0 = jnp.where(plane_par == color0, (omega / d0) * rp0, rp0)
        y0p1 = jnp.where(par1 == color0, (omega / d1) * rp1, rp1)
        y0w[0] = y0p0
        y0w[1] = y0p1
        prow[0] = jnp.zeros((N1, N2), jnp.float32)
        prow[1] = y0p0
        prow[2] = y0p1
        _, diag3p, up3p, dn3p = geom(3, -1)  # rows -1..1
        pv3 = prow[pl.ds(0, 3)]
        updp = (omega / diag3p) * (pv3 - neigh_sum(pv3, 3, up3p, dn3p))
        yw[0] = jnp.zeros((N1, N2), jnp.float32)
        yw[1] = jnp.where(plane_par == (1 - color0), updp[1], y0p0)

    @pl.when(i > 0)
    def _compute():
        # ---- fresh x slab window: rows jT+1 .. jT+T+2 (with_z: xprev
        # already holds x = xpy_prev + P z from slide time; the 3
        # lookahead rows add their z on the fly) ---------------------------
        xw2[pl.ds(0, T - 1)] = xprev[pl.ds(1, T - 1)]
        if with_z:
            zlead = zexpand(z_ref[pl.ds(0, 2)], 4)
            xw2[T - 1] = x_ref[0] + zlead[0]
            xw2[T] = x_ref[1] + zlead[1]
            xw2[T + 1] = x_ref[2] + zlead[2]
        else:
            xw2[T - 1] = x_ref[0]
            xw2[T] = x_ref[1]
            xw2[T + 1] = x_ref[2]

        # ---- (A x) fresh slab rows jT+2 .. jT+T+1 ------------------------
        _, diagx, upx, dnx = geom(T + 2, 1)
        xv = xw2[:]
        axv = diagx * xv + neigh_sum(xv, T + 2, upx, dnx)
        axw[pl.ds(2, T)] = axv[1 : T + 1]

        # ---- r~ = (b - A x) + noise, fresh rows jT+2 .. jT+T+1 ------------
        if with_b:
            y0w[pl.ds(2, T - 2)] = (
                bprev[pl.ds(2, T - 2)] - axw[pl.ds(2, T - 2)]
            )
            y0w[pl.ds(T, 2)] = b_ref[pl.ds(0, 2)] - axw[pl.ds(T, 2)]
        else:
            y0w[pl.ds(2, T)] = 0.0 - axw[pl.ds(2, T)]
        if with_noise:
            for c in range(T // 2):  # one Box-Muller pair per row pair
                g = jT + 2 + 2 * c
                ee, eo = _eta_pair(su, stepu, g + row_off, N1, N2)
                y0w[2 + 2 * c] = (
                    y0w[2 + 2 * c] + nscale * jnp.sqrt(diag_row(g)) * ee
                )
                y0w[3 + 2 * c] = (
                    y0w[3 + 2 * c] + nscale * jnp.sqrt(diag_row(g + 1)) * eo
                )

        # ---- phase 0 IN PLACE on the fresh slab: colour-0 cells become
        # y = (w/D) r~ (colour-1 cells keep r~) ----------------------------
        par0, diag0, _, _ = geom(T, 2)
        v0 = y0w[pl.ds(2, T)]
        y0w[pl.ds(2, T)] = jnp.where(par0 == color0, (omega / diag0) * v0, v0)

        # ---- phase 1: colour-1 cells read fresh colour-0 y; fresh slab
        # rows jT+1 .. jT+T from the (T+2)-row y0 window jT .. jT+T+1 ------
        par1w, diag1w, up1w, dn1w = geom(T + 2, 0)
        y0v = y0w[:]
        upd = (omega / diag1w) * (y0v - neigh_sum(y0v, T + 2, up1w, dn1w))
        sel = jnp.where(par1w == (1 - color0), upd, y0v)
        yw[pl.ds(2, T)] = sel[1 : T + 1]

        # ---- outputs from the assembled y window rows jT-1 .. jT+T -------
        _, diagy, upy, dny = geom(T + 2, -1)
        yv = yw[:]
        ayv = diagy * yv + neigh_sum(yv, T + 2, upy, dny)
        out = xprev[:] + yv[1 : T + 1]
        xpy_ref[:] = out
        if with_xsum:
            xsum_ref[:] = out.sum(axis=1, keepdims=True)

        # ---- restricted residual r = (b - A x) - A y on output rows ------
        if with_b:
            r2 = bprev[:] - axw[pl.ds(0, T)] - ayv[1 : T + 1]
        else:
            r2 = (0.0 - axw[pl.ds(0, T)]) - ayv[1 : T + 1]
        for c in range(T // 2):  # static unroll (no dynamic value slice)
            rp = r2[2 * c] + r2[2 * c + 1]
            rq_ref[c] = rp.reshape(N1 // 2, 2, N2).sum(1)

        # ---- carry the 2 rows the next tile's windows need ---------------
        axw[pl.ds(0, 2)] = axw[pl.ds(T, 2)]
        y0w[pl.ds(0, 2)] = y0w[pl.ds(T, 2)]
        yw[pl.ds(0, 2)] = yw[pl.ds(T, 2)]

    @pl.when(i == 0)
    def _init():
        xpy_ref[:] = x_ref[:]  # overwritten at step 1
        rq_ref[:] = jnp.zeros((T // 2, N1 // 2, N2), jnp.float32)
        if with_xsum:
            xsum_ref[:] = jnp.zeros((T, 1, N2), jnp.float32)

    @pl.when(i < G)
    def _slide():
        # with_z: the deferred prolong-add lands here, once per block —
        # xprev holds x = xpy_prev + P z
        if with_z:
            xprev[:] = x_ref[:] + zexpand(z_ref[:], T)
        else:
            xprev[:] = x_ref[:]
        if with_b:
            bprev[:] = b_ref[:]

    if with_zsum:
        # z blocks are min(i, G-1): each block 0..G-1 appears exactly once
        # over the steps i < G (block G-1 repeats at i == G — excluded).
        @pl.when(i == 0)
        def _zsum_init():
            zsum_ref[:] = z_ref[:].sum(axis=(0, 1), keepdims=True)

        @pl.when(jnp.logical_and(i > 0, i < G))
        def _zsum_acc():
            zsum_ref[:] = zsum_ref[:] + z_ref[:].sum(
                axis=(0, 1), keepdims=True
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sweep", "tile", "interpret", "with_noise", "n0_global", "with_xsum",
        "with_zsum",
    ),
)
def fused_chain_down_fd(
    x,
    b,
    coeffs,  # (6,) f32: axis0 lo/hi, axis1 lo/hi, axis2 lo/hi
    kappa2,
    hinv2,
    omega,
    seed,  # int32 scalar
    step,  # int32 scalar
    noise_mult=1.0,
    sweep: str = "forward",
    tile: "int | None" = None,
    interpret: bool = False,
    with_noise: bool = True,
    row_offset=0,  # global row of array row 0 (traced; shard_map use)
    n0_global: "int | None" = None,  # global grid extent for masks
    zx2=None,  # (N0/2, N1/2, N2) lane-duplicated coarse correction
    with_xsum: bool = False,
    with_zsum: bool = False,
):
    """(xpy, rq[, xsum][, zsum]): fused chain-level MGMC down-phase.

    xpy = x + y0 where y0 is one stochastic red/black SOR sweep from zero
    applied to r~ = (b - A x) + noise; rq is the 2x2x2-aggregate
    restriction of (b - A x) - A y0 with the lane pair-sum still open:
    ``rc = rq.reshape(n0/2, n1/2, n2/2, 2).sum(-1)``.

    ``zx2`` defers the previous cycle's fine prolong-add into this
    kernel: the chain state is x_true = x + P z where ``zx2`` is z with
    lanes pre-duplicated (``zx2[m, p, k] = z[m, p, k // 2]``), and the
    kernel expands rows/sublanes on the fly — x_true never touches HBM
    (saves read xpy + write x + read x ~= 1.6 fine-grid passes/cycle vs
    materialising; the adds happen in the same order, so results are
    bit-identical).  ``with_xsum`` additionally emits xpy summed over
    axis 1 so a mean-QOI chain never re-reads the fine grid.
    ``with_zsum`` (requires zx2) emits the (1, 1, N2) lane sums of the
    zx2 INPUT — i.e. of the PREVIOUS step's coarse correction — so the
    chain driver recovers the previous sample's global sum without an
    extra pass over zx2 (``sum(x_prev) = sum(xsum_prev) + 4*sum(zsum)``,
    the 4 because zx2 duplicates lanes and P duplicates 2 axes more).

    ``b=None`` declares the RHS identically zero (prior sampling — the
    flagship benchmark): the kernel skips the whole b stream (one fine
    HBM read/step plus its VMEM slide), computing ``0.0 - A x`` where it
    would compute ``b - A x`` — bit-identical to passing explicit zeros.
    """
    with_b = b is not None
    N0, N1, N2 = x.shape
    if n0_global is None:
        n0_global = N0
    from parmgmc_tpu.kernels.rb_gibbs import _PLANE_LIMIT

    if N1 * N2 > _PLANE_LIMIT:
        if zx2 is not None or with_xsum or with_zsum:
            raise ValueError(
                "deferred-z / xsum need the whole-plane chain kernel "
                f"(plane {N1}x{N2} exceeds {_PLANE_LIMIT} points)"
            )
        # whole-plane windows exceed VMEM: 2D-tiled variant
        return fused_chain_down_2d(
            x,
            b,
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
            row_offset=row_offset,
            n0_global=n0_global,
        )
    with_z = zx2 is not None
    if with_zsum and not with_z:
        raise ValueError("with_zsum requires zx2")
    # VMEM planes (staged-slab layout): stage scratch 4(T+2) + xprev/
    # bprev 2T + prow 4 + x/b/xpy blocks 6T + rq blocks T/2 + slab value
    # temporaries (axv/upd/sel/ayv/shifts ~ 6 slabs of T+2); with_z adds
    # the half-size z input blocks and the per-block zexpand temporary
    # (the prolong-add lands at slide time — no z window).  The budget
    # deliberately keeps the old windowed kernel's coefficients (they
    # bound the new layout: measured-good tiles stay identical).
    # Dropping the b stream removes its pipeline blocks + bprev (~3T).
    coef = (
        (19 if with_z else 17)
        + (1 if with_noise else 0)
        - (0 if with_b else 3)
    )
    const = (36 if with_z else 28) + (2 if with_noise else 0)
    T = _auto_tile(N0, N1 * N2 * 4, coef, const, tile)
    if tile is None:
        while T and T > 16:  # Mosaic compile blows up past T=16
            T //= 2
    while T >= 4 and (N0 % T or N0 < 2 * T or T % 2):
        T //= 2
    if T < 4 or N0 % T or N0 < 2 * T:
        raise ValueError(f"grid dim {N0} unsupported (need N0 % 4 == 0, >= 8)")
    if N0 % 2 or N1 % 2 or N2 % 2:
        raise ValueError("restriction needs even dims")
    G = N0 // T
    color0 = 0 if sweep == "forward" else 1

    fscal = jnp.concatenate(
        [
            jnp.asarray([omega], jnp.float32),
            jnp.asarray(coeffs, jnp.float32).reshape(6),
            jnp.asarray([noise_mult, kappa2, hinv2], jnp.float32),
        ]
    )
    iscal = jnp.stack(
        [
            jnp.asarray(seed, jnp.int32),
            jnp.asarray(color0, jnp.int32),
            jnp.asarray(step, jnp.int32),
            jnp.asarray(row_offset, jnp.int32),
        ]
    )

    kern = functools.partial(
        _kernel_chain,
        T=T,
        shape=(N0, N1, N2),
        with_noise=with_noise,
        n0_global=n0_global,
        with_z=with_z,
        with_xsum=with_xsum,
        with_zsum=with_zsum,
        with_b=with_b,
    )
    lookahead = lambda i: (jnp.minimum(i, G - 1), 0, 0)
    produced = lambda i: (jnp.maximum(i - 1, 0), 0, 0)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((T, N1, N2), lookahead, memory_space=pltpu.VMEM),
    ]
    args = [fscal, iscal, x]
    if with_b:
        in_specs.append(
            pl.BlockSpec((T, N1, N2), lookahead, memory_space=pltpu.VMEM)
        )
        args.append(b)
    if with_z:
        in_specs.append(
            pl.BlockSpec(
                (T // 2, N1 // 2, N2), lookahead, memory_space=pltpu.VMEM
            )
        )
        args.append(zx2)
    out_specs = [
        pl.BlockSpec((T, N1, N2), produced, memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (T // 2, N1 // 2, N2), produced, memory_space=pltpu.VMEM
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
        jax.ShapeDtypeStruct((N0 // 2, N1 // 2, N2), jnp.float32),
    ]
    if with_xsum:
        # (T, 1, N2) blocks: a 2D (T, N2) block trips the sublane-tiling
        # requirement when T < 8 (the 512^3 tile is 4)
        out_specs.append(
            pl.BlockSpec(
                (T, 1, N2),
                lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((N0, 1, N2), jnp.float32))
    if with_zsum:
        out_specs.append(
            pl.BlockSpec(
                (1, 1, N2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((1, 1, N2), jnp.float32))
    scratch_shapes = [
        pltpu.VMEM((T + 2, N1, N2), jnp.float32),  # xw2 (x slab window)
        pltpu.VMEM((T + 2, N1, N2), jnp.float32),  # axw (A x + 2-row carry)
        pltpu.VMEM((T + 2, N1, N2), jnp.float32),  # y0w (r~/phase-0 + carry)
        pltpu.VMEM((T + 2, N1, N2), jnp.float32),  # yw (y + 2-row carry)
        pltpu.VMEM((T, N1, N2), jnp.float32),  # xprev (z-added when with_z)
    ]
    if with_b:
        scratch_shapes.append(pltpu.VMEM((T, N1, N2), jnp.float32))  # bprev
    scratch_shapes.append(
        pltpu.VMEM((4, N1, N2), jnp.float32)  # prow (tile-1 prologue)
    )
    return pl.pallas_call(
        kern,
        grid=(G + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(*args)


# ---------------------------------------------------------------------------
# v3: 2D-tiled CHAIN down-phase for planes past the whole-plane VMEM
# window (768^2+ — see kernels.rb_gibbs v3 for the tiling scheme).
#
# Same semantics as _kernel_chain, window-style instead of pipelined:
# each (i0, i1) program DMAs halo-extended x and b windows
# ((T0+8, T1+16, N2) — the chain phase chain r = b-Ax -> y -> r-Ay
# consumes three rings, rounded up to 4 / _JB for noise alignment),
# recomputes r, builds r~ with (row-pair, j-block)-keyed noise, runs the
# from-zero sweep in place, and emits xpy = x + y plus the aggregate-
# restricted residual.  Halo recompute is bit-identical across tiles, so
# the result equals the 1D chain kernel's up to f32 rounding.
# ---------------------------------------------------------------------------


def _kernel_chain_2d(
    fscal_ref,  # SMEM (10,) f32: omega, c0lo..c2hi, noise_mult, kappa2, hinv2
    iscal_ref,  # SMEM (4,) i32: seed, color0, step, row_off
    *refs,
    T0: int,
    T1: int,
    shape: tuple,
    with_noise: bool,
    n0_global: int,
    with_z: bool = False,
    with_xsum: bool = False,
    with_zsum: bool = False,
    with_b: bool = True,
):
    """Ref layout (after the two SMEM scalars), in pallas_call order:

    inputs   x_hbm, [b_hbm]    ANY (N0, N1, N2).  ``with_b=False`` (zero
                               RHS, prior sampling) drops the b stream:
                               no b DMA, no b windows, and every
                               ``b - ...`` term is ``0.0 - ...`` —
                               bit-identical to streaming explicit zeros
             [z_hbm]           ANY (N0//2, N1, N2): the previous step's
                               coarse correction in ``zf`` layout —
                               leading axis compressed ONLY.  Sublanes
                               and lanes stay at fine resolution because
                               Mosaic can neither lane-duplicate values
                               nor DMA sublane windows at the 4-mod-8
                               starts a (N1//2)-dim layout would need
                               (probe_lane_dup.py, BENCH_NOTES).
    outputs  xpy_ref           VMEM (T0, T1, N2) block (i0, i1, 0)
             rq_ref            VMEM (T0//2, T1//2, N2) block
             [xsum_ref]        VMEM (T0, 1, N2) block (i0, 0, 0): xpy
                               summed over axis 1, accumulated over i1
             [zsum_ref]        VMEM (1, 1, N2) block (0, 0, 0): sums of
                               the z_hbm tile regions (each z point
                               once), accumulated over every tile
    scratch  xw, [bw]          (2, W0, W1, N2) double-buffered windows
             rt                (W0, W1, N2)
             [zw]              (2, W0//2, W1, N2) z window slots
             sem               DMA semaphores (3 if with_z else 2, 2)
    """
    x_hbm = refs[0]
    k = 1
    b_hbm = refs[k] if with_b else None
    k += 1 if with_b else 0
    z_hbm = refs[k] if with_z else None
    k += 1 if with_z else 0
    xpy_ref, rq_ref = refs[k], refs[k + 1]
    k += 2
    xsum_ref = refs[k] if with_xsum else None
    k += 1 if with_xsum else 0
    zsum_ref = refs[k] if with_zsum else None
    k += 1 if with_zsum else 0
    xw = refs[k]
    k += 1
    bw = refs[k] if with_b else None
    k += 1 if with_b else 0
    rt = refs[k]
    k += 1
    zw = refs[k] if with_z else None
    k += 1 if with_z else 0
    sem = refs[k]
    N0, N1, N2 = shape
    N0G = n0_global
    H0 = 4
    W0 = T0 + 2 * H0
    W1 = min(T1 + 2 * _JB2, N1)
    G1 = N1 // T1
    total = (N0 // T0) * G1
    i0 = pl.program_id(0)
    i1 = pl.program_id(1)
    t = i0 * G1 + i1
    slot = t % 2

    def tile_start(tt):
        i0t = tt // G1
        i1t = tt - i0t * G1
        s0t = pl.multiple_of(jnp.clip(i0t * T0 - H0, 0, N0 - W0), 2)
        s1t = pl.multiple_of(jnp.clip(i1t * T1 - _JB2, 0, N1 - W1), _JB2)
        return s0t, s1t

    def copies(tt, sl):
        s0t, s1t = tile_start(tt)
        cps = [
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(s0t, W0), pl.ds(s1t, W1)],
                xw.at[sl],
                sem.at[0, sl],
            ),
        ]
        if with_b:
            cps.append(
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(s0t, W0), pl.ds(s1t, W1)],
                    bw.at[sl],
                    sem.at[1, sl],
                )
            )
        if with_z:
            # z rows at half resolution: rows [s0t//2, s0t//2 + W0//2)
            # cover fine rows [s0t, s0t + W0); the sublane range is the
            # x window's (8-aligned starts by construction)
            cps.append(
                pltpu.make_async_copy(
                    z_hbm.at[pl.ds(s0t // 2, W0 // 2), pl.ds(s1t, W1)],
                    zw.at[sl],
                    sem.at[2 if with_b else 1, sl],
                )
            )
        return cps

    # Double-buffered windows (see kernels.rb_gibbs._kernel_2d): tile
    # t+1's DMA overlaps tile t's compute.
    @pl.when(t == 0)
    def _first():
        for c in copies(0, 0):
            c.start()

    @pl.when(t + 1 < total)
    def _prefetch():
        for c in copies(t + 1, 1 - slot):
            c.start()

    for c in copies(t, slot):
        c.wait()
    s0, s1 = tile_start(t)

    if with_z:
        # Deferred prolong-add: x = x_in + P z lands in the window once,
        # right after the DMA — everything downstream (A x, the xpy
        # output add) reads the true chain state.  Expansion is a
        # leading-axis repeat only (zf layout), done in row-pair slabs
        # so the broadcast temp is (2, W1, N2) instead of a full window
        # (whole-window RHS blew the scoped-VMEM budget at 768^3: the
        # compiler keeps the expanded value AND the add result live).
        for m in range(W0 // 2):
            zrow = zw[slot, m]
            xw[slot, pl.ds(2 * m, 2)] = xw[
                slot, pl.ds(2 * m, 2)
            ] + jnp.broadcast_to(zrow[None], (2, W1, N2))

    omega = fscal_ref[0]
    noise_mult = fscal_ref[7]
    kappa2 = fscal_ref[8]
    hinv2 = fscal_ref[9]
    seed = iscal_ref[0]
    color0 = iscal_ref[1]
    step = iscal_ref[2]
    row_off = iscal_ref[3]
    su = seed.astype(jnp.uint32)
    stepu = step.astype(jnp.uint32)
    nscale = jnp.sqrt((2.0 - omega) / omega) * noise_mult

    c0lo, c0hi = fscal_ref[1], fscal_ref[2]
    c1lo, c1hi = fscal_ref[3], fscal_ref[4]
    c2lo, c2hi = fscal_ref[5], fscal_ref[6]

    # ---- global geometry over the window (rows masked/keyed by GLOBAL
    # row g3 = s0 + row_off + ll against n0_global; shard_map callers
    # pass halo-extended local blocks with even row_off) ------------------
    ll3 = jax.lax.broadcasted_iota(jnp.int32, (W0, W1, N2), 0)
    jj3 = jax.lax.broadcasted_iota(jnp.int32, (W0, W1, N2), 1)
    kk3 = jax.lax.broadcasted_iota(jnp.int32, (W0, W1, N2), 2)
    par3 = (ll3 + jj3 + kk3) % 2  # s0 + row_off, s1 even
    g3 = (s0 + row_off) + ll3
    jg3 = s1 + jj3
    up3 = (g3 >= 1).astype(jnp.float32)
    dn3 = (g3 <= N0G - 2).astype(jnp.float32)
    diag3 = kappa2 + hinv2 * (
        up3
        + dn3
        + (jg3 >= 1).astype(jnp.float32)
        + (jg3 <= N1 - 2).astype(jnp.float32)
        + (kk3 >= 1).astype(jnp.float32)
        + (kk3 <= N2 - 2).astype(jnp.float32)
    )
    winv3 = omega / diag3

    def neigh_sum(v3):
        return (
            c0lo * up3 * _shift_plane(v3, 0, -1, W0)
            + c0hi * dn3 * _shift_plane(v3, 0, 1, W0)
            + c1lo * _shift_plane(v3, 1, -1, W1)
            + c1hi * _shift_plane(v3, 1, 1, W1)
            + c2lo * _shift_plane(v3, 2, -1, N2)
            + c2hi * _shift_plane(v3, 2, 1, N2)
        )

    # ---- r = b - A x (valid one ring in from the window edge) ------------
    xv = xw[slot]
    ax3 = diag3 * xv + neigh_sum(xv)
    rt[:] = (bw[slot] - ax3) if with_b else (0.0 - ax3)

    # ---- r~ = r + noise, (row-pair, j-block) keyed -----------------------
    # Only rows [base0-2, base0+T0+2) can reach an output (y is consumed
    # on [base0-1, base0+T0+1) by the ay neighbour reads, and phase 1
    # there reads one more ring of r~); rows outside get no noise — the
    # skipped window rows' swept values are discarded, so outputs are
    # bit-identical while the sequential PRNG loop drops from W0/2 to
    # T0/2+2 row pairs (2.25x -> 1.56x window amplification at the
    # 768^3 (16,64) tile).
    nbase0 = pl.multiple_of(i0 * T0 - s0, 2)
    if with_noise:
        nq = W1 // _JB2
        c_lo = jnp.maximum(nbase0 - 2, 0) // 2
        c_hi = jnp.minimum(nbase0 + T0 + 2, W0) // 2
        kkb = jax.lax.broadcasted_iota(jnp.int32, (_JB2, N2), 1)
        lanes_ip = (kkb >= 1).astype(jnp.float32) + (kkb <= N2 - 2).astype(
            jnp.float32
        )
        jlb = jax.lax.broadcasted_iota(jnp.int32, (_JB2, N2), 0)

        def noise_blk(t, _):
            c = t // nq
            q = t - c * nq
            l = 2 * c
            off = q * _JB2
            g = s0 + row_off + l
            jb = s1 // _JB2 + q
            ee, eo = _eta_pair_blk(su, stepu, g, jb, N2)
            jg = jlb + (s1 + off)
            links_ip = (
                lanes_ip
                + (jg >= 1).astype(jnp.float32)
                + (jg <= N1 - 2).astype(jnp.float32)
            )

            def dslab(gr):
                ok = (gr >= 1).astype(jnp.float32) + (gr <= N0G - 2).astype(
                    jnp.float32
                )
                return kappa2 + hinv2 * (links_ip + ok)

            rt[l, pl.ds(off, _JB2)] = rt[l, pl.ds(off, _JB2)] + (
                nscale * jnp.sqrt(dslab(g)) * ee
            )
            rt[l + 1, pl.ds(off, _JB2)] = rt[l + 1, pl.ds(off, _JB2)] + (
                nscale * jnp.sqrt(dslab(g + 1)) * eo
            )
            return 0

        jax.lax.fori_loop(c_lo * nq, c_hi * nq, noise_blk, 0, unroll=False)

    # ---- from-zero sweep IN PLACE (colour-0 cells become y, colour-1
    # cells still hold r~ until phase 1 — neighbour reads always land on
    # the opposite colour) -------------------------------------------------
    r0 = rt[:]
    rt[:] = jnp.where(par3 == color0, winv3 * r0, r0)
    y0 = rt[:]
    upd3 = winv3 * (y0 - neigh_sum(y0))
    rt[:] = jnp.where(par3 == (1 - color0), upd3, y0)

    # ---- outputs ---------------------------------------------------------
    base0 = pl.multiple_of(i0 * T0 - s0, 2)
    base1 = pl.multiple_of(i1 * T1 - s1, _JB2)
    yf = rt[:]
    out = (
        xw[slot, pl.ds(base0, T0), pl.ds(base1, T1)]
        + rt[pl.ds(base0, T0), pl.ds(base1, T1)]
    )
    xpy_ref[:] = out

    if with_xsum:
        # (i0, 0, 0) block revisited across i1: accumulate axis-1 sums
        psum = out.sum(axis=1, keepdims=True)

        @pl.when(i1 == 0)
        def _xsum_init():
            xsum_ref[:] = psum

        @pl.when(i1 > 0)
        def _xsum_acc():
            xsum_ref[:] = xsum_ref[:] + psum

    if with_zsum:
        # each tile sums ITS z region (tile regions partition z_hbm);
        # the (0,0,0) block accumulates across every grid step
        zpart = zw[
            slot, pl.ds(base0 // 2, T0 // 2), pl.ds(base1, T1)
        ].sum(axis=(0, 1), keepdims=True)

        @pl.when(t == 0)
        def _zsum_init():
            zsum_ref[:] = zpart

        @pl.when(t > 0)
        def _zsum_acc():
            zsum_ref[:] = zsum_ref[:] + zpart

    # r2 = (b - A x) - A y, staged through rt (dead once yf is read) so
    # the tile slice is a ref read (Mosaic has no dynamic_slice on
    # values).  TWO ref writes on purpose: the ref round-trip between
    # ``b - A x`` and ``- A y`` pins the arithmetic order, keeping the
    # with_b=False path BIT-identical to streaming explicit zeros (one
    # fused ``(b - ax3) - ay3`` expression contracts differently when b
    # is a loaded window vs the constant 0.0).
    ay3 = diag3 * yf + neigh_sum(yf)
    rt[:] = (bw[slot] - ax3) if with_b else (0.0 - ax3)
    rt[:] = rt[:] - ay3
    r2t = rt[pl.ds(base0, T0), pl.ds(base1, T1)]
    for c in range(T0 // 2):  # static unroll
        rp = r2t[2 * c] + r2t[2 * c + 1]
        rq_ref[c] = rp.reshape(T1 // 2, 2, N2).sum(1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sweep", "tile2d", "interpret", "with_noise", "n0_global",
        "with_xsum", "with_zsum", "staged",
    ),
)
def fused_chain_down_2d(
    x,
    b,
    coeffs,  # (6,) f32
    kappa2,
    hinv2,
    omega,
    seed,
    step,
    noise_mult=1.0,
    sweep: str = "forward",
    tile2d: "tuple | None" = None,
    interpret: bool = False,
    with_noise: bool = True,
    row_offset=0,  # global row of array row 0 (traced; shard_map use)
    n0_global: "int | None" = None,
    zf=None,  # (N0//2, N1, N2) leading-compressed coarse correction
    with_xsum: bool = False,
    with_zsum: bool = False,
    staged: "bool | None" = None,
):
    """(xpy, rq[, xsum][, zsum]): 2D-tiled fused chain-level MGMC
    down-phase — the large-plane counterpart of
    :func:`fused_chain_down_fd` (same outputs,
    ``rc = rq.reshape(n0/2, n1/2, n2/2, 2).sum(-1)``).

    ``staged=None`` auto-routes to :func:`fused_chain_down_2d_staged`
    (same results, no axis-0 halo recompute) whenever no explicit
    ``tile2d`` was requested and a staged tile is feasible; ``staged``
    True/False forces the choice (an explicit ``tile2d`` then names a
    tile for the chosen variant).

    ``zf`` defers the previous cycle's fine prolong-add into this kernel
    like the whole-plane kernel's ``zx2``, but in the ``zf`` layout:
    ``zf[m, j, k] = z[m, j // 2, k // 2]`` — ONLY the leading axis is
    compressed.  Mosaic can neither lane-duplicate values nor DMA the
    4-mod-8 sublane starts a half-resolution in-plane layout would need
    (BENCH_NOTES "Mosaic probes"), so in-plane expansion happens at
    PRODUCTION time (one XLA broadcast) and the kernel only repeats the
    leading axis.  ``xsum`` is xpy summed over axis 1 (shape
    (N0, 1, N2)); ``zsum`` is the (1, 1, N2) sum over the zf input
    (``sum(P0 z) = 2 * sum(zf)``).  ``b=None`` declares a zero RHS
    (prior sampling) and drops the whole b stream — no window DMA, and
    bit-identical results to streaming explicit zeros."""
    from parmgmc_tpu.kernels.rb_gibbs import _tile2d_auto

    with_b = b is not None
    N0, N1, N2 = x.shape
    if n0_global is None:
        n0_global = N0
    if N0 % 2 or N1 % 2 or N2 % 2:
        raise ValueError("restriction needs even dims")
    with_z = zf is not None
    if with_zsum and not with_z:
        raise ValueError("with_zsum requires zf")
    if with_z and zf.shape != (N0 // 2, N1, N2):
        raise ValueError(f"zf must be {(N0 // 2, N1, N2)}, got {zf.shape}")
    if staged is None:
        try:
            _tile2d_staged(N0, N1, N2, with_b=with_b, with_z=with_z)
            staged = tile2d is None
        except ValueError:
            staged = False
    if staged:
        return fused_chain_down_2d_staged(
            x,
            b,
            coeffs,
            kappa2,
            hinv2,
            omega,
            seed,
            step,
            noise_mult=noise_mult,
            sweep=sweep,
            tile2d=tile2d,
            interpret=interpret,
            with_noise=with_noise,
            row_offset=row_offset,
            n0_global=n0_global,
            zf=zf,
            with_xsum=with_xsum,
            with_zsum=with_zsum,
        )
    H0 = 4
    # x/b windows are double-buffered (2 slots each) + the rt window;
    # the two zf window slots are half-height, so they count as one.
    # streams=10 for with_z is MEASURED, not counted: at 768^3 the
    # compiler reports ~15.4 window-equivalents of scoped VMEM on the
    # zf path (126.5M at a (16,96) tile vs the 124M limit) — ~3.4
    # windows of temporaries beyond the non-z calibration, independent
    # of how the prolong-add is chunked.  Dropping the b stream removes
    # both its double-buffered window slots (the final residual stages
    # through rt either way).
    streams = (10 if with_z else 5) - (0 if with_b else 2)
    T0, T1 = _tile2d_auto(N0, N1, N2, streams, requested=tile2d, h0=2 * H0)
    W0, W1 = T0 + 2 * H0, min(T1 + 2 * _JB2, N1)
    if N0 % T0 or T0 % 2 or N0 < W0:
        raise ValueError(f"bad axis-0 tile {T0} for {N0}")
    if N1 % T1 or T1 % _JB2 or W1 % _JB2:
        raise ValueError(f"bad axis-1 tile {T1} for {N1}")
    color0 = 0 if sweep == "forward" else 1

    fscal = jnp.concatenate(
        [
            jnp.asarray([omega], jnp.float32),
            jnp.asarray(coeffs, jnp.float32).reshape(6),
            jnp.asarray([noise_mult, kappa2, hinv2], jnp.float32),
        ]
    )
    iscal = jnp.stack(
        [
            jnp.asarray(seed, jnp.int32),
            jnp.asarray(color0, jnp.int32),
            jnp.asarray(step, jnp.int32),
            jnp.asarray(row_offset, jnp.int32),
        ]
    )

    kern = functools.partial(
        _kernel_chain_2d,
        T0=T0,
        T1=T1,
        shape=(N0, N1, N2),
        with_noise=with_noise,
        n0_global=n0_global,
        with_z=with_z,
        with_xsum=with_xsum,
        with_zsum=with_zsum,
        with_b=with_b,
    )
    win2 = pltpu.VMEM((2, W0, W1, N2), jnp.float32)
    win = pltpu.VMEM((W0, W1, N2), jnp.float32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [smem, smem, any_spec]
    args = [fscal, iscal, x]
    if with_b:
        in_specs.append(any_spec)
        args.append(b)
    if with_z:
        in_specs.append(any_spec)
        args.append(zf)
    out_specs = [
        pl.BlockSpec(
            (T0, T1, N2), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (T0 // 2, T1 // 2, N2),
            lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
        jax.ShapeDtypeStruct((N0 // 2, N1 // 2, N2), jnp.float32),
    ]
    if with_xsum:
        out_specs.append(
            pl.BlockSpec(
                (T0, 1, N2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((N0, 1, N2), jnp.float32))
    if with_zsum:
        out_specs.append(
            pl.BlockSpec(
                (1, 1, N2), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((1, 1, N2), jnp.float32))
    scratch = [win2] + ([win2] if with_b else []) + [win]
    if with_z:
        scratch.append(pltpu.VMEM((2, W0 // 2, W1, N2), jnp.float32))
    n_sem = (1 if with_b else 0) + (1 if with_z else 0) + 1
    scratch.append(pltpu.SemaphoreType.DMA((n_sem, 2)))
    out = pl.pallas_call(
        kern,
        grid=(N0 // T0, N1 // T1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(*args)
    return tuple(out)


# ---------------------------------------------------------------------------
# v4: STAGED-SLAB 2D chain down-phase.
#
# The windowed v3 kernel above recomputes every pipeline stage over a
# halo-extended (T0+8, T1+16) window per tile — 1.875x window
# amplification (DMA bytes AND VPU phase work) at the 768^3 (16,64)
# tile.  This variant applies the 1D chain kernel's staged-slab
# dataflow (see _kernel_chain) along axis 0 *within a column strip*:
# the grid is (N1//T1, N0//T0 + 1) with the axis-0 index INNERMOST, so
# each strip walks down the grid carrying 2 rows per stage in scratch —
# every stage row is computed exactly once, and the DMA fetches each
# (T0, W1) block exactly once (no axis-0 halo re-fetch).  Only the
# in-plane halo remains: amplification drops to ~W1/T1 (1.125 at
# T1=128) plus the (T0+2)/T0 stage-carry overlap.
#
# Same formulas, same (row-pair, j-block)-keyed noise as v3, so results
# match the windowed kernel exactly in interpret mode and statistically
# on chip.  xsum/zsum are emitted as PER-STRIP partials (a strip cannot
# accumulate into a block another strip revisits later); the wrapper
# sums the (G1, ...) leading axis — one tiny XLA reduction.
# ---------------------------------------------------------------------------


def _tile2d_staged(N0, N1, N2, *, with_b, with_z, requested=None, t1_mult=_JB2):
    """(T0, T1) for the staged kernel: minimise in-plane amplification
    (W1/T1) times the stage-carry overlap ((T0+2)/T0), tie-broken
    toward bigger tiles.  Caps mirror _tile2d_auto's MEASURED Mosaic
    limits (slab volume in place of window volume).  ``t1_mult=16``
    restricts to tiles whose z windows stay 16-aligned (the "zx2"
    carry layout's compressed-sublane DMA constraint)."""
    if requested is not None:
        return requested
    if t1_mult > _JB2 and N1 % t1_mult:
        raise ValueError(f"N1 {N1} not a multiple of {t1_mult}")
    from parmgmc_tpu.kernels.rb_gibbs import VMEM_LIMIT

    # VMEM rows (units of one (W1, N2) f32 plane): DMA buffers 2*T0
    # (+2*T0 b, +T0 z) + stage scratch 4*(T0+2) + xprev T0 (+bprev T0)
    # + prow 4 + out blocks ~1.5*T0 + ~6 slab temporaries of (T0+2).
    a = 13.5 + (3 if with_b else 0) + (1 if with_z else 0)
    c = 32
    # Tiles whose scoped-VMEM estimate runs close to VMEM_LIMIT are
    # MEASURED slower despite better amplification keys (768^3 chain,
    # 2026-08-19, examples/probe_chain768.py: (16,128) @117 MB 32.9 ms
    # and (8,256) @125 MB 34.9 ms vs (16,96) @91 MB 31.0 ms and
    # (8,192) @95 MB 30.9 ms) — prefer tiles under the soft cap and
    # fall back to the full range only if none fits.  110 MB keeps the
    # measured-good (16,96) feasible for the with_b chain (107 MB)
    # while excluding the measured-slow >115 MB tiles.
    soft_vmem = 110_000_000
    best = best_soft = None
    for T0 in (24, 16, 8, 4):
        if N0 % T0 or N0 < 2 * T0:
            continue
        for T1 in range(N1, _JB2 - 1, -_JB2):
            if N1 % T1 or T1 % t1_mult:
                continue
            W1 = min(T1 + 2 * _JB2, N1)
            if W1 % _JB2:
                continue
            vol = (T0 + 2) * W1 * N2
            if vol > (3_200_000 if W1 <= 144 else 2_400_000):
                continue
            vm = (a * T0 + c) * W1 * N2 * 4
            if vm > VMEM_LIMIT:
                continue
            key = ((T0 + 2) / T0 * W1 / T1, -T0 * T1)
            if best is None or key < best[0]:
                best = (key, (T0, T1))
            if vm <= soft_vmem and (
                best_soft is None or key < best_soft[0]
            ):
                best_soft = (key, (T0, T1))
    if best_soft is not None:
        return best_soft[1]
    if best is None:
        raise ValueError(
            f"no feasible staged 2D tile for grid ({N0}, {N1}, {N2})"
        )
    return best[1]


def _kernel_chain_2d_staged(
    fscal_ref,  # SMEM (10,) f32: omega, c0lo..c2hi, noise_mult, kappa2, hinv2
    iscal_ref,  # SMEM (4,) i32: seed, color0, step, row_off
    *refs,
    T0: int,
    T1: int,
    shape: tuple,
    with_noise: bool,
    n0_global: int,
    with_z: bool = False,
    with_xsum: bool = False,
    with_zsum: bool = False,
    with_b: bool = True,
    z_layout: str = "zf",
):
    """Ref layout (after the two SMEM scalars), in pallas_call order:

    inputs   x_hbm, [b_hbm]    ANY (N0, N1, N2)
             [z_hbm]           ANY, the deferred coarse correction in
                               ``z_layout`` form: "zf" (N0//2, N1, N2)
                               (leading axis compressed only — see v3)
                               or "zx2" (N0//2, N1//2, N2) (lanes
                               pre-duplicated, sublanes compressed —
                               the 1D kernel's layout; halves the z
                               stream's HBM bytes; sublanes expand
                               in-kernel through the zex scratch)
    outputs  xpy_ref           VMEM (T0, T1, N2) block (max(i0-1,0), i1)
             rq_ref            VMEM (T0//2, T1//2, N2) same block
             [xsum_ref]        VMEM (1, T0, 1, N2) block (i1,
                               max(i0-1,0), 0, 0): PER-STRIP axis-1
                               partial sums of xpy
             [zsum_ref]        VMEM (1, 1, 1, N2) block (i1, 0, 0, 0):
                               per-strip sums of the z tile regions
                               (of the COMPRESSED array for "zx2" —
                               callers weight by 4 instead of 2)
    scratch  xdma, [bdma]      (2, T0, W1, N2) double-buffered blocks
             [zdma]            (2, T0//2, W1, N2) for "zf";
                               (2, T0//2, W1z//2, N2) for "zx2", where
                               W1z >= W1 + (s1 - s1z) is the 16-aligned
                               fine-column cover of the x window
             xw2               (T0+2, W1, N2) x slab window
             axw, y0w, yw      (T0+2, W1, N2) stage slabs + 2-row carry
             xprev, [bprev]    (T0, W1, N2) previous block (x z-added)
             prow              (4, W1, N2) strip prologue rows
             [zex]             (W1z, N2) sublane-expansion staging
                               ("zx2" only): expanded planes are read
                               back at the 8-aligned dynamic offset
                               doff = s1 - s1z (Mosaic can't slice
                               VALUES dynamically — ref round trip)
             sem               DMA semaphores (n_streams, 2)

    Stage row spans per produced tile j = i0 - 1 (strip-local columns,
    global rows): xw2 jT0+1..jT0+T0+2, axw/y0w jT0..jT0+T0+1,
    yw jT0-1..jT0+T0 — exactly the 1D staged kernel's layout (see
    _kernel_chain) over a W1-wide column window."""
    with_zx2 = with_z and z_layout == "zx2"
    x_hbm = refs[0]
    k = 1
    b_hbm = refs[k] if with_b else None
    k += 1 if with_b else 0
    z_hbm = refs[k] if with_z else None
    k += 1 if with_z else 0
    xpy_ref, rq_ref = refs[k], refs[k + 1]
    k += 2
    xsum_ref = refs[k] if with_xsum else None
    k += 1 if with_xsum else 0
    zsum_ref = refs[k] if with_zsum else None
    k += 1 if with_zsum else 0
    xdma = refs[k]
    k += 1
    bdma = refs[k] if with_b else None
    k += 1 if with_b else 0
    zdma = refs[k] if with_z else None
    k += 1 if with_z else 0
    xw2, axw, y0w, yw, xprev = refs[k : k + 5]
    k += 5
    bprev = refs[k] if with_b else None
    k += 1 if with_b else 0
    prow = refs[k]
    k += 1
    zex = refs[k] if with_zx2 else None
    k += 1 if with_zx2 else 0
    sem = refs[k]

    N0, N1, N2 = shape
    N0G = n0_global
    G0 = N0 // T0
    G1 = N1 // T1
    W1 = min(T1 + 2 * _JB2, N1)
    W1z = min(W1 + 2 * _JB2, N1)  # 16-aligned z cover (T1 % 16 for zx2)
    i1 = pl.program_id(0)
    i0 = pl.program_id(1)  # innermost: strips walk down axis 0
    t = i1 * (G0 + 1) + i0
    slot = t % 2  # consecutive grid steps alternate across strips too
    j = i0 - 1  # tile being produced
    jT = j * T0
    s1 = pl.multiple_of(jnp.clip(i1 * T1 - _JB2, 0, N1 - W1), _JB2)
    base1 = pl.multiple_of(i1 * T1 - s1, _JB2)
    s1z = pl.multiple_of(
        jnp.clip(i1 * T1 - 2 * _JB2, 0, N1 - W1z), 2 * _JB2
    )
    doff = pl.multiple_of(s1 - s1z, _JB2)  # 8-aligned (0..W1z-W1)

    def copies(i1t, i0t, sl):
        s1t = pl.multiple_of(jnp.clip(i1t * T1 - _JB2, 0, N1 - W1), _JB2)
        r0t = pl.multiple_of(jnp.minimum(i0t, G0 - 1) * T0, 2)
        cps = [
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(r0t, T0), pl.ds(s1t, W1)],
                xdma.at[sl],
                sem.at[0, sl],
            )
        ]
        if with_b:
            cps.append(
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(r0t, T0), pl.ds(s1t, W1)],
                    bdma.at[sl],
                    sem.at[1, sl],
                )
            )
        if with_zx2:
            s1zt2 = pl.multiple_of(
                jnp.clip(i1t * T1 - 2 * _JB2, 0, N1 - W1z) // 2, _JB2
            )
            cps.append(
                pltpu.make_async_copy(
                    z_hbm.at[
                        pl.ds(r0t // 2, T0 // 2), pl.ds(s1zt2, W1z // 2)
                    ],
                    zdma.at[sl],
                    sem.at[2 if with_b else 1, sl],
                )
            )
        elif with_z:
            cps.append(
                pltpu.make_async_copy(
                    z_hbm.at[pl.ds(r0t // 2, T0 // 2), pl.ds(s1t, W1)],
                    zdma.at[sl],
                    sem.at[2 if with_b else 1, sl],
                )
            )
        return cps

    def zrow_fine(sl, m):
        """The (W1, N2) fine-column z plane for row-pair m of the
        current block: "zf" reads it directly; "zx2" sublane-expands
        the compressed plane through zex and re-slices at doff."""
        if not with_zx2:
            return zdma[sl, m]
        zc = zdma[sl, m]  # (W1z//2, N2)
        zex[:] = jnp.broadcast_to(
            zc[:, None], (W1z // 2, 2, N2)
        ).reshape(W1z, N2)
        return zex[pl.ds(doff, W1)]

    @pl.when(t == 0)
    def _first():
        for c in copies(0, 0, 0):
            c.start()

    @pl.when(t + 1 < G1 * (G0 + 1))
    def _prefetch():
        i0n = i0 + 1
        wrap = i0n > G0
        i1n = jnp.where(wrap, i1 + 1, i1)
        i0n = jnp.where(wrap, 0, i0n)
        for c in copies(i1n, i0n, 1 - slot):
            c.start()

    for c in copies(i1, i0, slot):
        c.wait()

    omega = fscal_ref[0]
    noise_mult = fscal_ref[7]
    kappa2 = fscal_ref[8]
    hinv2 = fscal_ref[9]
    seed = iscal_ref[0]
    color0 = iscal_ref[1]
    step = iscal_ref[2]
    row_off = iscal_ref[3]
    su = seed.astype(jnp.uint32)
    stepu = step.astype(jnp.uint32)
    nscale = jnp.sqrt((2.0 - omega) / omega) * noise_mult

    c0lo, c0hi = fscal_ref[1], fscal_ref[2]
    c1lo, c1hi = fscal_ref[3], fscal_ref[4]
    c2lo, c2hi = fscal_ref[5], fscal_ref[6]

    # ---- strip geometry: global columns jg = s1 + jj, global rows
    # g = jT + off + row_off + ll (s1 8-aligned, T0/row_off even, so
    # parity reduces to (ll + off + jj + kk) % 2) ----------------------
    jj = jax.lax.broadcasted_iota(jnp.int32, (W1, N2), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (W1, N2), 1)
    jg = s1 + jj
    plane_par = (jg + kk) % 2
    links_inplane = (
        (jg >= 1).astype(jnp.float32)
        + (jg <= N1 - 2).astype(jnp.float32)
        + (kk >= 1).astype(jnp.float32)
        + (kk <= N2 - 2).astype(jnp.float32)
    )

    def diag_row(g):
        gg = g + row_off
        up_ok = (gg >= 1).astype(jnp.float32)
        dn_ok = (gg <= N0G - 2).astype(jnp.float32)
        return kappa2 + hinv2 * (links_inplane + up_ok + dn_ok)

    def geom(w, off):
        """(par3, diag3, up_ok3, dn_ok3) for a w-row slab whose row 0 is
        global row jT + off + row_off (off a static int)."""
        ll3 = jax.lax.broadcasted_iota(jnp.int32, (w, W1, N2), 0)
        g3 = (jT + off + row_off) + ll3
        par3 = (ll3 + (off % 2) + plane_par[None]) % 2
        up_ok3 = (g3 >= 1).astype(jnp.float32)
        dn_ok3 = (g3 <= N0G - 2).astype(jnp.float32)
        diag3 = kappa2 + hinv2 * (links_inplane[None] + up_ok3 + dn_ok3)
        return par3, diag3, up_ok3, dn_ok3

    def neigh_sum(v3, w, up_ok3, dn_ok3):
        return (
            c0lo * up_ok3 * _shift_plane(v3, 0, -1, w)
            + c0hi * dn_ok3 * _shift_plane(v3, 0, 1, w)
            + c1lo * _shift_plane(v3, 1, -1, W1)
            + c1hi * _shift_plane(v3, 1, 1, W1)
            + c2lo * _shift_plane(v3, 2, -1, N2)
            + c2hi * _shift_plane(v3, 2, 1, N2)
        )

    nq = W1 // _JB2
    kkb = jax.lax.broadcasted_iota(jnp.int32, (_JB2, N2), 1)
    lanes_ip = (kkb >= 1).astype(jnp.float32) + (kkb <= N2 - 2).astype(
        jnp.float32
    )
    jlb = jax.lax.broadcasted_iota(jnp.int32, (_JB2, N2), 0)

    def add_noise(row_lo, g_lo, n_pairs):
        """Add (row-pair, j-block)-keyed noise to y0w rows
        [row_lo, row_lo + 2*n_pairs) = global rows [g_lo, ...), one
        Box-Muller evaluation per (pair, block) — identical keying to
        the windowed v3 kernel."""

        def blk(tq, _):
            c = tq // nq
            q = tq - c * nq
            l = row_lo + 2 * c
            off = q * _JB2
            g = g_lo + row_off + 2 * c
            jb = s1 // _JB2 + q
            ee, eo = _eta_pair_blk(su, stepu, g, jb, N2)
            jgb = jlb + (s1 + off)
            links_ip = (
                lanes_ip
                + (jgb >= 1).astype(jnp.float32)
                + (jgb <= N1 - 2).astype(jnp.float32)
            )

            def dslab(gr):
                ok = (gr >= 1).astype(jnp.float32) + (
                    gr <= N0G - 2
                ).astype(jnp.float32)
                return kappa2 + hinv2 * (links_ip + ok)

            y0w[l, pl.ds(off, _JB2)] = y0w[l, pl.ds(off, _JB2)] + (
                nscale * jnp.sqrt(dslab(g)) * ee
            )
            y0w[l + 1, pl.ds(off, _JB2)] = y0w[l + 1, pl.ds(off, _JB2)] + (
                nscale * jnp.sqrt(dslab(g + 1)) * eo
            )
            return 0

        jax.lax.fori_loop(0, n_pairs * nq, blk, 0, unroll=False)

    @pl.when(i0 == 1)
    def _prologue():
        # Prime the stage carries for this strip: A x rows 0..1,
        # r~/phase-0 rows 0..1, y row 0 (plus a zero "row -1" masked by
        # up_ok) — same formulas/keying as the slabs (see _kernel_chain).
        prow[0] = jnp.zeros((W1, N2), jnp.float32)
        prow[1] = xprev[0]
        prow[2] = xprev[1]
        prow[3] = xprev[2]
        _, diag4, up4, dn4 = geom(4, -1)  # rows -1..2 (jT = 0 here)
        pv4 = prow[:]
        axp = diag4 * pv4 + neigh_sum(pv4, 4, up4, dn4)
        axw[0] = axp[1]
        axw[1] = axp[2]
        if with_b:
            y0w[0] = bprev[0] - axp[1]
            y0w[1] = bprev[1] - axp[2]
        else:
            y0w[0] = 0.0 - axp[1]
            y0w[1] = 0.0 - axp[2]
        if with_noise:
            add_noise(0, 0, 1)
        par2, diag2, _, _ = geom(2, 0)  # rows 0..1
        v2 = y0w[pl.ds(0, 2)]
        y0w[pl.ds(0, 2)] = jnp.where(
            par2 == color0, (omega / diag2) * v2, v2
        )
        prow[0] = jnp.zeros((W1, N2), jnp.float32)
        prow[1] = y0w[0]
        prow[2] = y0w[1]
        _, diag3p, up3p, dn3p = geom(3, -1)  # rows -1..1
        pv3 = prow[pl.ds(0, 3)]
        updp = (omega / diag3p) * (pv3 - neigh_sum(pv3, 3, up3p, dn3p))
        yw[0] = jnp.zeros((W1, N2), jnp.float32)
        yw[1] = jnp.where(plane_par == (1 - color0), updp[1], y0w[0])

    @pl.when(i0 > 0)
    def _compute():
        # ---- fresh x slab window: rows jT+1 .. jT+T0+2 ------------------
        xw2[pl.ds(0, T0 - 1)] = xprev[pl.ds(1, T0 - 1)]
        if with_z:
            zl0 = zrow_fine(slot, 0)  # z row for fine rows 0..1
            xw2[T0 - 1] = xdma[slot, 0] + zl0
            xw2[T0] = xdma[slot, 1] + zl0
            zl1 = zrow_fine(slot, 1)  # z row for fine rows 2..3
            xw2[T0 + 1] = xdma[slot, 2] + zl1
        else:
            xw2[T0 - 1] = xdma[slot, 0]
            xw2[T0] = xdma[slot, 1]
            xw2[T0 + 1] = xdma[slot, 2]

        # ---- (A x) fresh slab rows jT+2 .. jT+T0+1 ----------------------
        _, diagx, upx, dnx = geom(T0 + 2, 1)
        xv = xw2[:]
        axv = diagx * xv + neigh_sum(xv, T0 + 2, upx, dnx)
        axw[pl.ds(2, T0)] = axv[1 : T0 + 1]

        # ---- r~ = (b - A x) + noise, fresh rows jT+2 .. jT+T0+1 ----------
        if with_b:
            y0w[pl.ds(2, T0 - 2)] = (
                bprev[pl.ds(2, T0 - 2)] - axw[pl.ds(2, T0 - 2)]
            )
            y0w[pl.ds(T0, 2)] = bdma[slot, pl.ds(0, 2)] - axw[pl.ds(T0, 2)]
        else:
            y0w[pl.ds(2, T0)] = 0.0 - axw[pl.ds(2, T0)]
        if with_noise:
            add_noise(2, jT + 2, T0 // 2)

        # ---- phase 0 IN PLACE on the fresh slab --------------------------
        par0, diag0, _, _ = geom(T0, 2)
        v0 = y0w[pl.ds(2, T0)]
        y0w[pl.ds(2, T0)] = jnp.where(
            par0 == color0, (omega / diag0) * v0, v0
        )

        # ---- phase 1: fresh rows jT+1 .. jT+T0 from the y0 window --------
        par1w, diag1w, up1w, dn1w = geom(T0 + 2, 0)
        y0v = y0w[:]
        upd = (omega / diag1w) * (y0v - neigh_sum(y0v, T0 + 2, up1w, dn1w))
        sel = jnp.where(par1w == (1 - color0), upd, y0v)
        yw[pl.ds(2, T0)] = sel[1 : T0 + 1]

        # ---- outputs from the assembled y window rows jT-1 .. jT+T0 ------
        _, diagy, upy, dny = geom(T0 + 2, -1)
        yv = yw[:]
        ayv = diagy * yv + neigh_sum(yv, T0 + 2, upy, dny)
        out = (
            xprev[:, pl.ds(base1, T1)]
            + yw[pl.ds(1, T0), pl.ds(base1, T1)]
        )
        xpy_ref[:] = out
        if with_xsum:
            xsum_ref[0, :, 0, :] = out.sum(axis=1)

        # ---- restricted residual r = (b - A x) - A y on output rows ------
        # staged through xw2 (dead once axv is read): the tile column
        # slice must be a ref read, and the two separate writes pin the
        # arithmetic order so with_b=False stays bit-identical to
        # streaming explicit zeros (see v3).
        if with_b:
            xw2[pl.ds(0, T0)] = bprev[:] - axw[pl.ds(0, T0)]
        else:
            xw2[pl.ds(0, T0)] = 0.0 - axw[pl.ds(0, T0)]
        xw2[pl.ds(0, T0)] = xw2[pl.ds(0, T0)] - ayv[1 : T0 + 1]
        r2t = xw2[pl.ds(0, T0), pl.ds(base1, T1)]
        for c in range(T0 // 2):  # static unroll (no dynamic value slice)
            rp = r2t[2 * c] + r2t[2 * c + 1]
            rq_ref[c] = rp.reshape(T1 // 2, 2, N2).sum(1)

        # ---- carry the 2 rows the next tile's windows need ---------------
        axw[pl.ds(0, 2)] = axw[pl.ds(T0, 2)]
        y0w[pl.ds(0, 2)] = y0w[pl.ds(T0, 2)]
        yw[pl.ds(0, 2)] = yw[pl.ds(T0, 2)]

    @pl.when(i0 == 0)
    def _init():
        xpy_ref[:] = xdma[slot, :, pl.ds(base1, T1)]  # overwritten at i0=1
        rq_ref[:] = jnp.zeros((T0 // 2, T1 // 2, N2), jnp.float32)
        if with_xsum:
            xsum_ref[:] = jnp.zeros((1, T0, 1, N2), jnp.float32)

    @pl.when(i0 < G0)
    def _slide():
        # with_z: the deferred prolong-add lands here, once per block —
        # xprev holds x = xpy_prev + P z (row-pair slabs bound the
        # broadcast temporaries, see v3)
        if with_z:
            for m in range(T0 // 2):
                zrow = zrow_fine(slot, m)
                xprev[pl.ds(2 * m, 2)] = xdma[
                    slot, pl.ds(2 * m, 2)
                ] + jnp.broadcast_to(zrow[None], (2, W1, N2))
        else:
            xprev[:] = xdma[slot]
        if with_b:
            bprev[:] = bdma[slot]

    if with_zsum:
        # accumulate at slide steps: z blocks 0..G0-1 each fetched
        # exactly once per strip there; the tile column region [base1,
        # base1+T1) partitions z columns across strips.  For "zx2" the
        # sum runs over the COMPRESSED sublane region (start
        # (i1*T1 - s1z)//2, a multiple of 8) — callers weight by 4.
        if with_zx2:
            zb = pl.multiple_of((base1 + doff) // 2, _JB2)
            zT = T1 // 2
        else:
            zb, zT = base1, T1

        @pl.when(i0 == 0)
        def _zsum_init():
            zsum_ref[:] = zdma[slot, :, pl.ds(zb, zT)].sum(
                axis=(0, 1), keepdims=True
            )[None]

        @pl.when(jnp.logical_and(i0 > 0, i0 < G0))
        def _zsum_acc():
            zsum_ref[:] = zsum_ref[:] + zdma[
                slot, :, pl.ds(zb, zT)
            ].sum(axis=(0, 1), keepdims=True)[None]


@functools.partial(
    jax.jit,
    static_argnames=(
        "sweep", "tile2d", "interpret", "with_noise", "n0_global",
        "with_xsum", "with_zsum",
    ),
)
def fused_chain_down_2d_staged(
    x,
    b,
    coeffs,  # (6,) f32
    kappa2,
    hinv2,
    omega,
    seed,
    step,
    noise_mult=1.0,
    sweep: str = "forward",
    tile2d: "tuple | None" = None,
    interpret: bool = False,
    with_noise: bool = True,
    row_offset=0,  # global row of array row 0 (traced; shard_map use)
    n0_global: "int | None" = None,
    zf=None,  # (N0//2, N1, N2) leading-compressed coarse correction
    with_xsum: bool = False,
    with_zsum: bool = False,
    zx2=None,  # (N0//2, N1//2, N2) lane-duplicated coarse correction
):
    """(xpy, rq[, xsum][, zsum]): STAGED-SLAB 2D chain down-phase.

    Same contract and noise keying as :func:`fused_chain_down_2d` —
    results are identical (interpret-mode exact) — but the grid is
    (N1//T1, N0//T0 + 1) with axis 0 INNERMOST so each column strip
    walks down the grid carrying 2-row stage scratch, eliminating the
    windowed kernel's axis-0 halo re-fetch and recompute (the 1D
    staged-slab dataflow of :func:`fused_chain_down_fd` over a W1-wide
    column window).  ``xsum``/``zsum`` are emitted per strip and summed
    here (one tiny XLA reduction).

    The deferred carry comes in ONE of two layouts: ``zf`` as in the
    windowed kernel, or ``zx2`` — the 1D kernel's layout (lanes
    pre-duplicated, sublanes compressed), halving the z stream's HBM
    bytes AND its production broadcast; sublanes expand in-kernel.
    ``zx2`` needs T1 and N1 multiples of 16 (compressed-sublane DMA
    alignment) and makes ``zsum`` a sum over the COMPRESSED array —
    weight by 4 instead of 2 (``sum(P0 z) = 4 sum(zsum)``)."""
    with_b = b is not None
    N0, N1, N2 = x.shape
    if n0_global is None:
        n0_global = N0
    if N0 % 2 or N1 % 2 or N2 % 2:
        raise ValueError("restriction needs even dims")
    if zf is not None and zx2 is not None:
        raise ValueError("pass at most one of zf / zx2")
    with_zx2 = zx2 is not None
    with_z = zf is not None or with_zx2
    z_layout = "zx2" if with_zx2 else "zf"
    z_in = zx2 if with_zx2 else zf
    if with_zsum and not with_z:
        raise ValueError("with_zsum requires zf or zx2")
    if zf is not None and zf.shape != (N0 // 2, N1, N2):
        raise ValueError(f"zf must be {(N0 // 2, N1, N2)}, got {zf.shape}")
    if with_zx2 and zx2.shape != (N0 // 2, N1 // 2, N2):
        raise ValueError(
            f"zx2 must be {(N0 // 2, N1 // 2, N2)}, got {zx2.shape}"
        )
    T0, T1 = _tile2d_staged(
        N0, N1, N2, with_b=with_b, with_z=with_z, requested=tile2d,
        t1_mult=2 * _JB2 if with_zx2 else _JB2,
    )
    W1 = min(T1 + 2 * _JB2, N1)
    W1z = min(W1 + 2 * _JB2, N1)
    if N0 % T0 or T0 % 2 or T0 < 4 or N0 < 2 * T0:
        raise ValueError(f"bad axis-0 tile {T0} for {N0}")
    if N1 % T1 or T1 % _JB2 or W1 % _JB2:
        raise ValueError(f"bad axis-1 tile {T1} for {N1}")
    if with_zx2 and (T1 % (2 * _JB2) or N1 % (2 * _JB2)):
        raise ValueError(
            f"zx2 needs T1 and N1 multiples of 16, got T1={T1}, N1={N1}"
        )
    G0, G1 = N0 // T0, N1 // T1
    color0 = 0 if sweep == "forward" else 1

    fscal = jnp.concatenate(
        [
            jnp.asarray([omega], jnp.float32),
            jnp.asarray(coeffs, jnp.float32).reshape(6),
            jnp.asarray([noise_mult, kappa2, hinv2], jnp.float32),
        ]
    )
    iscal = jnp.stack(
        [
            jnp.asarray(seed, jnp.int32),
            jnp.asarray(color0, jnp.int32),
            jnp.asarray(step, jnp.int32),
            jnp.asarray(row_offset, jnp.int32),
        ]
    )

    kern = functools.partial(
        _kernel_chain_2d_staged,
        T0=T0,
        T1=T1,
        shape=(N0, N1, N2),
        with_noise=with_noise,
        n0_global=n0_global,
        with_z=with_z,
        with_xsum=with_xsum,
        with_zsum=with_zsum,
        with_b=with_b,
        z_layout=z_layout,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [smem, smem, any_spec]
    args = [fscal, iscal, x]
    if with_b:
        in_specs.append(any_spec)
        args.append(b)
    if with_z:
        in_specs.append(any_spec)
        args.append(z_in)
    produced = lambda i1, i0: (jnp.maximum(i0 - 1, 0), i1, 0)
    out_specs = [
        pl.BlockSpec((T0, T1, N2), produced, memory_space=pltpu.VMEM),
        pl.BlockSpec((T0 // 2, T1 // 2, N2), produced, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
        jax.ShapeDtypeStruct((N0 // 2, N1 // 2, N2), jnp.float32),
    ]
    if with_xsum:
        # per-strip axis-1 partials: (G1, N0, 1, N2), summed below
        out_specs.append(
            pl.BlockSpec(
                (1, T0, 1, N2),
                lambda i1, i0: (i1, jnp.maximum(i0 - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((G1, N0, 1, N2), jnp.float32))
    if with_zsum:
        out_specs.append(
            pl.BlockSpec(
                (1, 1, 1, N2),
                lambda i1, i0: (i1, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((G1, 1, 1, N2), jnp.float32))
    scratch = [pltpu.VMEM((2, T0, W1, N2), jnp.float32)]  # xdma
    if with_b:
        scratch.append(pltpu.VMEM((2, T0, W1, N2), jnp.float32))  # bdma
    if with_zx2:
        scratch.append(
            pltpu.VMEM((2, T0 // 2, W1z // 2, N2), jnp.float32)  # zdma
        )
    elif with_z:
        scratch.append(pltpu.VMEM((2, T0 // 2, W1, N2), jnp.float32))  # zdma
    scratch += [
        pltpu.VMEM((T0 + 2, W1, N2), jnp.float32),  # xw2
        pltpu.VMEM((T0 + 2, W1, N2), jnp.float32),  # axw
        pltpu.VMEM((T0 + 2, W1, N2), jnp.float32),  # y0w
        pltpu.VMEM((T0 + 2, W1, N2), jnp.float32),  # yw
        pltpu.VMEM((T0, W1, N2), jnp.float32),  # xprev
    ]
    if with_b:
        scratch.append(pltpu.VMEM((T0, W1, N2), jnp.float32))  # bprev
    scratch.append(pltpu.VMEM((4, W1, N2), jnp.float32))  # prow
    if with_zx2:
        scratch.append(pltpu.VMEM((W1z, N2), jnp.float32))  # zex
    n_sem = 1 + (1 if with_b else 0) + (1 if with_z else 0)
    scratch.append(pltpu.SemaphoreType.DMA((n_sem, 2)))
    out = pl.pallas_call(
        kern,
        grid=(G1, G0 + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(*args)
    out = list(out)
    k = 2
    if with_xsum:
        out[k] = out[k].sum(axis=0)  # (N0, 1, N2)
        k += 1
    if with_zsum:
        out[k] = out[k].sum(axis=0)  # (1, 1, N2)
    return tuple(out)


def chain_down_2d_zx2_supported(shape) -> bool:
    """Can :func:`fused_chain_down_2d_staged` consume a ``zx2`` carry on
    this grid?  (Staged tile with T1 % 16 feasible — the
    compressed-sublane z DMA alignment.)"""
    try:
        _tile2d_staged(
            shape[0], shape[1], shape[2],
            with_b=True, with_z=True, t1_mult=2 * _JB2,
        )
        return True
    except ValueError:
        return False


def chain_down_2d_supported(shape) -> bool:
    """Can :func:`fused_chain_down_2d` serve this grid?  Either variant
    will do: the staged-slab kernel (preferred) needs N0 a multiple of
    an even T0 >= 4 with N0 >= 2 T0; the windowed kernel carries a
    4-row axis-0 halo each side, so N0 >= T0 + 8."""
    try:
        _tile2d_staged(
            shape[0], shape[1], shape[2], with_b=True, with_z=True
        )
        return True
    except ValueError:
        pass
    try:
        from parmgmc_tpu.kernels.rb_gibbs import _tile2d_auto

        _tile2d_auto(shape[0], shape[1], shape[2], streams=5, h0=8)
        return True
    except ValueError:
        return False
