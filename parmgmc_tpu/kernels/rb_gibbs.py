"""Fused red/black Gibbs sweep — the TPU hot kernel.

This is the Pallas replacement for the reference's multicolour SOR hot
loop (``/root/reference/src/mc_sor.c:298-381``).  One ``pallas_call``
performs a full stochastic Gibbs sweep on a 3D constant-coefficient star
(7-point) stencil operator:

  1. stream a slab window of x, b, diag from HBM into VMEM,
  2. build the stochastic RHS b~ = b + sqrt((2-w)/w) D^{1/2} eta with
     eta generated ON CHIP (row-seeded counter PRNG + Box-Muller — the
     analogue of the reference's per-rank MKL streams, parmgmc.c:80-97),
  3. update the first colour, then the second colour using the
     freshly-updated first-colour values (halo rows are recomputed
     redundantly per tile, which is cheaper than a second launch),
  4. write the slab back.

Fusing noise + both colour half-sweeps into one kernel takes the sweep
from ~8 HBM passes (pad/shift lax path) to ~4 and from ~6 kernel
launches to 1.

Noise is keyed by (seed, global row): overlapping halo rows recompute
bit-identical values in adjacent tiles, so the sweep is exactly a
red/black SOR sweep applied to one well-defined b~ — the same iteration
family the exactness tests verify for the lax path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_rb_gibbs_sweep",
    "fused_rb_gibbs_sweep_fd",
    "fused_rb_gibbs_sweep_2d",
    "fused_rb_gibbs_sweep_2d_staged",
    "fused_sweep_supported",
]

_TWO_PI = 6.283185307179586

# The default Mosaic scoped-vmem limit is 16 MiB, but the attached v5e
# accepts >= 124 MiB of kernel VMEM (measured: the (16,128)-tiled chain
# kernel's 116.4 MiB scoped allocation compiles and runs under this
# limit, 2026-08-17; earlier bisection proved >= 100 MiB).  All sweep
# kernels request this budget so whole-plane sliding windows keep
# working up to 512^2 planes and the 2D-tiled kernels can take the
# tall windows that minimise halo amplification.
VMEM_LIMIT = 124 * 1024 * 1024


def _compiler_params(**kw):
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT, **kw)


# Planes up to _PLANE_LIMIT points fit the whole-plane sliding-window
# kernels (512^2 with margin); larger planes dispatch to the 2D-tiled
# kernel (v3 below), whose in-plane halo/noise blocks are _JB rows.
_PLANE_LIMIT = 448 * 1024
_JB = 8


def _auto_tile(n0, plane_bytes, coef, const, requested, t_min=4, n0_min_mult=2):
    """Largest power-of-2 tile T <= 32 such that N0 % T == 0,
    N0 >= n0_min_mult*T, and the kernel's VMEM footprint
    (coef*T + const) planes fits the budget.  Bigger tiles amortise the
    per-step window-assembly copies (measured: T=4 -> 16 is ~20% faster
    at 256^3); smaller tiles keep 512^2 planes inside VMEM."""
    if requested is not None:
        return requested
    budget = int(VMEM_LIMIT * 0.85)
    t_cap = max(t_min, int((budget / plane_bytes - const) / coef))
    T = 32
    while T >= t_min:
        if T <= t_cap and n0 % T == 0 and n0 >= n0_min_mult * T:
            return T
        T //= 2
    return t_min  # let the wrapper's validity check raise


def _mix(a, b):
    """splitmix-style avalanche of two uint32s -> uint32."""
    x = a * np.uint32(0x9E3779B1) + b
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


# sin(2*pi*x) on [-1/4, 1/4] as an odd polynomial (Taylor degree 11 in
# y = 2*pi*x; max error 1.8e-7 over the full period after folding — f32
# rounding level, checked against float64 sin/cos on 2M points).
_SINCOS_COEFFS = tuple(
    (-1.0) ** k * _TWO_PI ** (2 * k + 1) / float(math.factorial(2 * k + 1))
    for k in range(6)
)


def _sin2pi_poly(x):
    x2 = x * x
    p = jnp.float32(_SINCOS_COEFFS[5])
    for c in _SINCOS_COEFFS[4::-1]:
        p = p * x2 + jnp.float32(c)
    return p * x


def _sincos2pi(t):
    """(cos 2*pi*t, sin 2*pi*t) for t in [0, 1).

    Box-Muller's angle is ALREADY a reduced argument — t is uniform on
    one period — so the generic jnp.sin/cos range reduction is pure
    waste.  One fold to [-1/4, 1/4] plus the odd polynomial replaces
    it.  Measured on the 256^3 chain kernel: 1.130 -> 0.896 ms/step
    (generic sin+cos were ~60% of the 0.39 ms noise cost; a Giles-style
    ICDF transform and a bitcast-exponent log were both tried and
    measured no better than the builtins — see BENCH_NOTES.md)."""
    r = t - jnp.floor(t + 0.5)  # [-0.5, 0.5]
    a = jnp.abs(r)
    sa = jnp.where(a > 0.25, 0.5 - a, a)
    s = jnp.where(r < 0, -_sin2pi_poly(sa), _sin2pi_poly(sa))
    c = _sin2pi_poly(0.25 - a)
    return c, s


def _eta_draw(h, n1, n2):
    """Two N(0,1) (n1, n2) slabs from hash h: one PRNG draw + one
    Box-Muller evaluation (the cos and sin branches)."""
    pltpu.prng_seed(h.astype(jnp.int32))
    bits = pltpu.bitcast(pltpu.prng_random_bits((2, n1, n2)), jnp.uint32)
    # >>9 leaves 23 bits, so the int32 view is exact (Mosaic has no
    # direct uint32 -> f32 cast).
    hi1 = pltpu.bitcast(bits[0] >> 9, jnp.int32)
    hi2 = pltpu.bitcast(bits[1] >> 9, jnp.int32)
    u1 = hi1.astype(jnp.float32) * (1.0 / (1 << 23)) + 1e-7
    u2 = hi2.astype(jnp.float32) * (1.0 / (1 << 23))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    c, s = _sincos2pi(u2)
    return r * c, r * s


def _eta_pair(su, stepu, g_even, n1, n2):
    """(eta_even, eta_odd): N(0,1) planes for GLOBAL rows g_even and
    g_even+1.  Keyed by (seed, step, g_even), so any tile or shard
    that touches either row of the pair regenerates bit-identical values.
    Halves the transcendental cost vs a draw per row — the noise was
    ~1 ms of the 2.1 ms chain down-phase at 256^3."""
    gu = g_even.astype(jnp.uint32)
    return _eta_draw(_mix(_mix(su, stepu), gu), n1, n2)


def _eta_pair_blk(su, stepu, g_even, jb, n2):
    """(eta_even, eta_odd): N(0,1) (_JB, n2) slabs for GLOBAL rows
    (g_even, g_even+1) restricted to axis-1 rows [jb*_JB, (jb+1)*_JB).
    Keyed by (seed, step, g_even, jb): the 2D-tiled kernel's in-plane
    analogue of the row-keyed stream — any tile whose (aligned) window
    overlaps the block regenerates bit-identical values."""
    gu = g_even.astype(jnp.uint32)
    ju = jb.astype(jnp.uint32)
    return _eta_draw(_mix(_mix(_mix(su, stepu), gu), ju), _JB, n2)


def _eta_row(su, stepu, g, n1, n2):
    """Single-row access to the paired stream (stray boundary rows):
    regenerates the row's pair and selects the right member.  Floor
    division keeps negative halo rows (sharded callers) consistent."""
    ge = (g // 2) * 2
    e, o = _eta_pair(su, stepu, ge, n1, n2)
    return jnp.where((g % 2) == 0, e, o)


def _shift_plane(a, axis, by, n):
    """a[..., i+by, ...] with zero fill along an in-plane axis (1 or 2)."""
    pads = [(0, 0)] * a.ndim
    pads[axis] = (max(0, -by), max(0, by))
    ap = jnp.pad(a, pads)
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(max(0, by), max(0, by) + a.shape[axis])
    return ap[tuple(sl)]


def _kernel(
    fscal_ref,  # SMEM (8,) f32: omega, c0lo, c0hi, c1lo, c1hi, c2lo, c2hi, noise_mult
    iscal_ref,  # SMEM (3,) i32: seed, color0, step
    x_hbm,  # ANY (N0, N1, N2)
    b_hbm,  # ANY
    d_hbm,  # ANY
    o_ref,  # VMEM (T, N1, N2) output block
    xw,  # scratch VMEM (W, N1, N2)
    bt,  # scratch VMEM (W, N1, N2) — b, then b~
    dw,  # scratch VMEM (W, N1, N2)
    sem,  # DMA semaphores (3,)
    *,
    T: int,
    shape: tuple,
    with_noise: bool,
):
    N0, N1, N2 = shape
    W = T + 4
    i0 = pl.program_id(0)
    s = jnp.clip(i0 * T - 2, 0, N0 - W)

    cp_x = pltpu.make_async_copy(x_hbm.at[pl.ds(s, W)], xw, sem.at[0])
    cp_b = pltpu.make_async_copy(b_hbm.at[pl.ds(s, W)], bt, sem.at[1])
    cp_d = pltpu.make_async_copy(d_hbm.at[pl.ds(s, W)], dw, sem.at[2])
    cp_x.start()
    cp_b.start()
    cp_d.start()
    cp_x.wait()
    cp_b.wait()
    cp_d.wait()

    omega = fscal_ref[0]
    noise_mult = fscal_ref[7]
    seed = iscal_ref[0]
    color0 = iscal_ref[1]
    step = iscal_ref[2]

    # ---- b~ = b + noise_mult * sqrt((2-w)/w) * sqrt(diag) * eta, row keyed.
    nscale = jnp.sqrt((2.0 - omega) / omega) * noise_mult
    su = seed.astype(jnp.uint32)
    stepu = step.astype(jnp.uint32)

    def noise_pair(c, _):
        # s is always even (clip of even endpoints), so window rows come
        # in globally aligned pairs served by one Box-Muller evaluation.
        l = 2 * c
        ee, eo = _eta_pair(su, stepu, s + l, N1, N2)
        bt[l] = bt[l] + nscale * jnp.sqrt(dw[l]) * ee
        bt[l + 1] = bt[l + 1] + nscale * jnp.sqrt(dw[l + 1]) * eo
        return 0

    if with_noise:  # static: the deterministic path carries no PRNG ops
        jax.lax.fori_loop(0, W // 2, noise_pair, 0, unroll=False)

    # ---- masks / geometry ------------------------------------------------
    jj = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 1)
    plane_par = (jj + kk) % 2

    c0lo, c0hi = fscal_ref[1], fscal_ref[2]
    c1lo, c1hi = fscal_ref[3], fscal_ref[4]
    c2lo, c2hi = fscal_ref[5], fscal_ref[6]

    # Whole-window phases: rows within a colour phase are independent
    # (axis-0 neighbours have the opposite parity), so each phase is ONE
    # vector op over the (W, N1, N2) window (see kernels.mg_sweep).
    ll3 = jax.lax.broadcasted_iota(jnp.int32, (W, N1, N2), 0)
    g3 = s + ll3
    # s is even (clip of even endpoints): parity reduces to ll + plane
    par3 = (ll3 + plane_par[None]) % 2
    up_ok3 = (g3 >= 1).astype(jnp.float32)
    dn_ok3 = (g3 <= N0 - 2).astype(jnp.float32)

    def phase(color):
        xv = xw[:]
        sumn3 = (
            c0lo * up_ok3 * _shift_plane(xv, 0, -1, W)
            + c0hi * dn_ok3 * _shift_plane(xv, 0, 1, W)
            + c1lo * _shift_plane(xv, 1, -1, N1)
            + c1hi * _shift_plane(xv, 1, 1, N1)
            + c2lo * _shift_plane(xv, 2, -1, N2)
            + c2hi * _shift_plane(xv, 2, 1, N2)
        )
        upd3 = (1.0 - omega) * xv + (omega / dw[:]) * (bt[:] - sumn3)
        xw[:] = jnp.where(par3 == color, upd3, xv)

    phase(color0)
    phase(1 - color0)

    base = i0 * T - s  # local index of global row i0*T (0, 2 or 4)
    o_ref[:] = xw[pl.ds(base, T)]


@functools.partial(
    jax.jit, static_argnames=("sweep", "tile", "interpret", "with_noise")
)
def fused_rb_gibbs_sweep(
    x,
    b,
    diag,
    coeffs,  # (6,) f32: axis0 lo/hi, axis1 lo/hi, axis2 lo/hi
    omega,
    seed,  # int32 scalar
    step,  # int32 scalar (chain iteration — part of the noise key)
    noise_mult=1.0,
    sweep: str = "forward",
    tile: int = 4,
    interpret: bool = False,
    with_noise: bool = True,
):
    """One fused stochastic red/black SOR sweep on a 3D star stencil.

    x, b, diag: (N0, N1, N2) f32. coeffs: the six constant off-diagonal
    coefficients (lo/hi per axis). noise_mult=0 gives the deterministic
    sweep (used by exactness tests against the lax path).
    """
    N0, N1, N2 = x.shape
    if N1 * N2 > _PLANE_LIMIT:
        # whole-plane windows exceed VMEM: 2D-tiled variant
        return fused_rb_gibbs_sweep_2d(
            x,
            b,
            diag,
            coeffs,
            omega,
            seed,
            step,
            noise_mult=noise_mult,
            sweep=sweep,
            interpret=interpret,
            with_noise=with_noise,
        )
    T = tile
    # T even keeps tile starts (and the s = i0*T - 2 / N0 - W clip
    # endpoints) even, so the paired noise stream stays row-aligned.
    # (Whole-window phases add ~4 windows of value temporaries; the
    # default T=4 window is small, so no budget adjustment needed.)
    while N0 % T or N0 < T + 4 or T % 2:
        T //= 2
        if T == 0:
            raise ValueError(f"grid dim {N0} too small for fused sweep")
    color0 = 0 if sweep == "forward" else 1

    fscal = jnp.concatenate(
        [
            jnp.asarray([omega], jnp.float32),
            jnp.asarray(coeffs, jnp.float32).reshape(6),
            jnp.asarray([noise_mult], jnp.float32),
        ]
    )
    iscal = jnp.asarray(
        [seed, color0, step], jnp.int32
    )

    kern = functools.partial(
        _kernel, T=T, shape=(N0, N1, N2), with_noise=with_noise
    )
    return pl.pallas_call(
        kern,
        grid=(N0 // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (T, N1, N2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T + 4, N1, N2), jnp.float32),
            pltpu.VMEM((T + 4, N1, N2), jnp.float32),
            pltpu.VMEM((T + 4, N1, N2), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(fscal, iscal, x, b, diag)


# ---------------------------------------------------------------------------
# v2: software-pipelined sweep (delay-by-one sliding window).
#
# Grid step i loads block i of x and b (pallas double-buffers the block
# streams) and computes/writes tile j = i-1 using:
#   * tail_x  — pre-sweep x rows jT-2, jT-1   (saved two steps ago),
#   * xprev   — pre-sweep x block j           (saved last step),
#   * x_cur[0:2] — pre-sweep x rows jT+T, jT+T+1,
#   * tail_b/bprev/one fresh row — the stochastic RHS b~ rows jT-1..jT+T
#     (noise generated ONCE per row, keyed by global row).
# Every input byte is fetched exactly once per sweep; out block indices
# repeat only consecutively (0,0,1,...,G-1) so each tile is flushed once.
# The diagonal is recomputed in-kernel from the FD link-count formula
# (diag = kappa^2 + hinv2 * #in-grid neighbours) — no diag traffic.
# ---------------------------------------------------------------------------


def _kernel_v2(
    fscal_ref,  # SMEM (10,) f32: omega, c0lo..c2hi, noise_mult, kappa2, hinv2
    iscal_ref,  # SMEM (4,) i32: seed, color0, step, row_off
    x_ref,  # VMEM (T, N1, N2) block min(i, G-1)
    b_ref,  # VMEM (T, N1, N2) block min(i, G-1)
    o_ref,  # VMEM (T, N1, N2) block max(i-1, 0)
    xw,  # scratch (T+4, N1, N2): pre/post-sweep window rows jT-2..jT+T+1
    bw,  # scratch (T+2, N1, N2): b~ rows jT-1..jT+T
    xprev,  # scratch (T, N1, N2): pre-sweep x of block j (saved last step)
    bprev,  # scratch (T, N1, N2): b~ of block j (computed last step)
    tail_x,  # scratch (2, N1, N2): pre-sweep x rows jT-2, jT-1
    tail_b,  # scratch (1, N1, N2): b~ row jT-1
    *,
    T: int,
    shape: tuple,
    with_noise: bool,
    n0_global: int,
):
    # Rows are masked/keyed by GLOBAL row gg = g + row_off against the
    # GLOBAL extent n0_global: on one device row_off = 0 and
    # n0_global = N0; under shard_map the caller passes a halo-extended
    # local block with row_off = shard_start - halo, so boundary masks,
    # the red/black colouring, the FD diagonal and the noise stream all
    # agree with the single-device sweep.
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

    def eta_row(g):
        """N(0,1) plane for GLOBAL row g + row_off from the paired
        stream (regenerates the pair, selects the member)."""
        return _eta_row(su, stepu, g + row_off, N1, N2)

    def diag_row(g):
        gg = g + row_off
        up_ok = (gg >= 1).astype(jnp.float32)
        dn_ok = (gg <= N0G - 2).astype(jnp.float32)
        return kappa2 + hinv2 * (links_inplane + up_ok + dn_ok)

    def btilde_row(braw, g):
        if with_noise:
            return braw + nscale * jnp.sqrt(diag_row(g)) * eta_row(g)
        return braw

    @pl.when(i > 0)
    def _compute():
        # ---- assemble contiguous windows (VMEM -> VMEM, cheap) ----------
        xw[0] = tail_x[0]
        xw[1] = tail_x[1]
        xw[pl.ds(2, T)] = xprev[:]
        xw[T + 2] = x_ref[0]
        xw[T + 3] = x_ref[1]
        bw[0] = tail_b[0]
        bw[pl.ds(1, T)] = bprev[:]
        bw[T + 1] = btilde_row(b_ref[0], jT + T)

        # ---- whole-window phases (rows within a phase are independent;
        # see kernels.mg_sweep) — xw row l <-> array row jT - 2 + l ------
        Wv = T + 4
        ll3 = jax.lax.broadcasted_iota(jnp.int32, (Wv, N1, N2), 0)
        gg3 = (jT - 2 + row_off) + ll3
        # jT - 2 + row_off is even (T and row_off even): parity reduces
        # to (ll + plane parity), j-independent
        par3 = (ll3 + plane_par[None]) % 2
        up_ok3 = (gg3 >= 1).astype(jnp.float32)
        dn_ok3 = (gg3 <= N0G - 2).astype(jnp.float32)
        diag3 = kappa2 + hinv2 * (links_inplane[None] + up_ok3 + dn_ok3)
        # b~ aligned to xw rows: b3[l] = bw[l-1] (rows 0/T+3 masked off)
        b3 = jnp.pad(bw[:], ((1, 1), (0, 0), (0, 0)))

        def phase(color, lo, hi):
            xv = xw[:]
            sumn3 = (
                c0lo * up_ok3 * _shift_plane(xv, 0, -1, Wv)
                + c0hi * dn_ok3 * _shift_plane(xv, 0, 1, Wv)
                + c1lo * _shift_plane(xv, 1, -1, N1)
                + c1hi * _shift_plane(xv, 1, 1, N1)
                + c2lo * _shift_plane(xv, 2, -1, N2)
                + c2hi * _shift_plane(xv, 2, 1, N2)
            )
            upd3 = (1.0 - omega) * xv + (omega / diag3) * (b3 - sumn3)
            sel = jnp.logical_and(
                jnp.logical_and(ll3 >= lo, ll3 < hi), par3 == color
            )
            xw[:] = jnp.where(sel, upd3, xv)

        # red rows jT-1..jT+T (xw 1..T+2), then black rows jT..jT+T-1
        phase(color0, 1, T + 3)
        phase(1 - color0, 2, T + 2)
        o_ref[:] = xw[pl.ds(2, T)]

    @pl.when(i == 0)
    def _init():
        # rows -2/-1 don't exist for tile 0; zero tails (garbage scratch
        # would otherwise leak NaNs past the boundary masks)
        tail_x[0] = jnp.zeros((N1, N2), jnp.float32)
        tail_x[1] = jnp.zeros((N1, N2), jnp.float32)
        tail_b[0] = jnp.zeros((N1, N2), jnp.float32)
        o_ref[:] = x_ref[:]  # overwritten at step 1

    # ---- slide (tails from the OLD pre-sweep xprev/bprev) ----------------
    @pl.when(jnp.logical_and(i > 0, i < G))
    def _slide_tails():
        tail_x[0] = xprev[T - 2]
        tail_x[1] = xprev[T - 1]
        tail_b[0] = bprev[T - 1]

    @pl.when(i < G)
    def _slide():
        xprev[:] = x_ref[:]

        def brow_slide(c, _):
            # block starts are even and row_off is even (sharded callers
            # guarantee local rows % 4 == 0), so slide rows form globally
            # aligned pairs: one Box-Muller evaluation per two rows.
            r = 2 * c
            g = i * T + r
            if with_noise:
                ee, eo = _eta_pair(su, stepu, g + row_off, N1, N2)
                bprev[r] = b_ref[r] + nscale * jnp.sqrt(diag_row(g)) * ee
                bprev[r + 1] = (
                    b_ref[r + 1] + nscale * jnp.sqrt(diag_row(g + 1)) * eo
                )
            else:
                bprev[r] = b_ref[r]
                bprev[r + 1] = b_ref[r + 1]
            return 0

        jax.lax.fori_loop(0, T // 2, brow_slide, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("sweep", "tile", "interpret", "with_noise", "n0_global"),
)
def fused_rb_gibbs_sweep_fd(
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
    tile: "int | None" = None,
    interpret: bool = False,
    with_noise: bool = True,
    row_offset=0,  # global row of array row 0 (traced; shard_map use)
    n0_global: "int | None" = None,  # global grid extent for masks
):
    """Pipelined fused sweep for FD shifted-Laplace operators.

    Like :func:`fused_rb_gibbs_sweep` but software-pipelined (every input
    byte fetched once) and with the diagonal recomputed in-kernel from
    the link-count formula — no diag HBM traffic.

    ``row_offset``/``n0_global`` let a shard_map caller sweep a
    halo-extended local block while keying noise, boundary masks and the
    red/black colouring by GLOBAL row — see parallel.fused.
    """
    N0, N1, N2 = x.shape
    if n0_global is None:
        n0_global = N0
    if N1 * N2 > _PLANE_LIMIT:
        # whole-plane windows exceed VMEM: 2D-tiled variant (recomputes
        # the FD diagonal in-kernel, so still no diag HBM traffic)
        return fused_rb_gibbs_sweep_2d(
            x,
            b,
            None,
            coeffs,
            omega,
            seed,
            step,
            noise_mult=noise_mult,
            sweep=sweep,
            interpret=interpret,
            with_noise=with_noise,
            fd_params=jnp.stack(
                [
                    jnp.asarray(kappa2, jnp.float32),
                    jnp.asarray(hinv2, jnp.float32),
                ]
            ),
            row_offset=row_offset,
            n0_global=n0_global,
        )
    # VMEM planes: scratch 4T+9 + double-buffered x/b/out blocks 6T +
    # whole-window phase temporaries (~5 windows)
    T = _auto_tile(N0, N1 * N2 * 4, 15, 29, tile, t_min=2)
    if tile is None:
        while T and T > 16:  # Mosaic compile blows up past T=16
            T //= 2
    while T and (N0 % T or N0 < 2 * T or T % 2):
        T //= 2
    if not T:
        raise ValueError(f"grid dim {N0} unsupported")
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
        _kernel_v2,
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
            pl.BlockSpec(
                (T, N1, N2),
                lambda i: (jnp.minimum(i, G - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (T, N1, N2),
            lambda i: (jnp.maximum(i - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T + 4, N1, N2), jnp.float32),  # xw
            pltpu.VMEM((T + 2, N1, N2), jnp.float32),  # bw
            pltpu.VMEM((T, N1, N2), jnp.float32),  # xprev
            pltpu.VMEM((T, N1, N2), jnp.float32),  # bprev
            pltpu.VMEM((2, N1, N2), jnp.float32),  # tail_x
            pltpu.VMEM((1, N1, N2), jnp.float32),  # tail_b
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(fscal, iscal, x, b)


# ---------------------------------------------------------------------------
# v3: 2D-tiled window sweep for planes too large for whole-plane VMEM
# windows (> _PLANE_LIMIT points: 768^2 and up).
#
# The grid is (N0//T0, N1//T1); each program DMAs a halo-extended
# (T0+4, T1+2*_JB, N2) window, regenerates the stochastic RHS for the
# window, runs both colour phases as whole-window vector ops, and writes
# the interior (T0, T1, N2) block.  Axis-1 windows are kept _JB-aligned
# (halo width = _JB >= the 2 rows the two phases need), so noise can be
# keyed by (seed, step, row-pair, axis-1 block): overlapping halo
# regions recompute bit-identical b~ in adjacent tiles — the same
# self-consistency argument as the row-keyed 1D kernels, extended
# in-plane.  This closes the reference's scale-free hot loop
# (/root/reference/src/mc_sor.c:298-381) at any plane size.
# ---------------------------------------------------------------------------


def _kernel_2d(
    fscal_ref,  # SMEM (10,) f32: omega, c0lo..c2hi, noise_mult, kappa2, hinv2
    iscal_ref,  # SMEM (4,) i32: seed, color0, step, row_off
    *refs,
    T0: int,
    T1: int,
    shape: tuple,
    with_noise: bool,
    fd: bool,
    n0_global: int,
):
    N0, N1, N2 = shape
    N0G = n0_global
    if fd:
        x_hbm, b_hbm, o_ref, xw, bt, sem = refs
        dw = None
    else:
        x_hbm, b_hbm, d_hbm, o_ref, xw, bt, dw, sem = refs
    W0 = T0 + 4
    W1 = min(T1 + 2 * _JB, N1)
    G1 = N1 // T1
    total = (N0 // T0) * G1
    i0 = pl.program_id(0)
    i1 = pl.program_id(1)
    t = i0 * G1 + i1
    slot = t % 2

    # s0 is even (T0 and the clip endpoint are even); s1 is a multiple of
    # _JB (T1 % _JB == 0 and N1 - W1 % _JB == 0), so noise pairs and
    # noise blocks stay globally aligned in every window.
    def tile_start(tt):
        i0t = tt // G1
        i1t = tt - i0t * G1
        s0t = pl.multiple_of(jnp.clip(i0t * T0 - 2, 0, N0 - W0), 2)
        s1t = pl.multiple_of(jnp.clip(i1t * T1 - _JB, 0, N1 - W1), _JB)
        return s0t, s1t

    def copies(tt, sl):
        s0t, s1t = tile_start(tt)
        cps = [
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(s0t, W0), pl.ds(s1t, W1)],
                xw.at[sl],
                sem.at[0, sl],
            ),
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(s0t, W0), pl.ds(s1t, W1)],
                bt.at[sl],
                sem.at[1, sl],
            ),
        ]
        if not fd:
            cps.append(
                pltpu.make_async_copy(
                    d_hbm.at[pl.ds(s0t, W0), pl.ds(s1t, W1)],
                    dw.at[sl],
                    sem.at[2, sl],
                )
            )
        return cps

    # Double-buffered windows: tile t+1's DMA is in flight while tile t
    # computes (the sync-copy version lost ~25% of the 768^3 sweep to
    # serialized window loads).
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

    # ---- b~ = b + nscale * sqrt(diag) * eta, (row-pair, j-block) keyed.
    if with_noise:  # static: the deterministic path carries no PRNG ops
        nq = W1 // _JB
        kkb = jax.lax.broadcasted_iota(jnp.int32, (_JB, N2), 1)
        lanes_ip = (kkb >= 1).astype(jnp.float32) + (kkb <= N2 - 2).astype(
            jnp.float32
        )
        jlb = jax.lax.broadcasted_iota(jnp.int32, (_JB, N2), 0)

        def noise_blk(t, _):
            c = t // nq
            q = t - c * nq
            l = 2 * c
            off = q * _JB
            g = s0 + row_off + l
            jb = s1 // _JB + q
            ee, eo = _eta_pair_blk(su, stepu, g, jb, N2)
            if fd:
                jg = jlb + (s1 + off)
                links_ip = (
                    lanes_ip
                    + (jg >= 1).astype(jnp.float32)
                    + (jg <= N1 - 2).astype(jnp.float32)
                )

                def dslab(gr):
                    ok = (gr >= 1).astype(jnp.float32) + (
                        gr <= N0G - 2
                    ).astype(jnp.float32)
                    return kappa2 + hinv2 * (links_ip + ok)

                de, do = dslab(g), dslab(g + 1)
            else:
                de = dw[slot, l, pl.ds(off, _JB)]
                do = dw[slot, l + 1, pl.ds(off, _JB)]
            bt[slot, l, pl.ds(off, _JB)] = bt[slot, l, pl.ds(off, _JB)] + (
                nscale * jnp.sqrt(de) * ee
            )
            bt[slot, l + 1, pl.ds(off, _JB)] = bt[
                slot, l + 1, pl.ds(off, _JB)
            ] + (nscale * jnp.sqrt(do) * eo)
            return 0

        jax.lax.fori_loop(0, (W0 // 2) * nq, noise_blk, 0, unroll=False)

    # ---- whole-window phases (rows within a phase are independent) ------
    ll3 = jax.lax.broadcasted_iota(jnp.int32, (W0, W1, N2), 0)
    jj3 = jax.lax.broadcasted_iota(jnp.int32, (W0, W1, N2), 1)
    kk3 = jax.lax.broadcasted_iota(jnp.int32, (W0, W1, N2), 2)
    # s0 + row_off and s1 are even: parity reduces to local indices
    par3 = (ll3 + jj3 + kk3) % 2
    g3 = (s0 + row_off) + ll3
    up_ok3 = (g3 >= 1).astype(jnp.float32)
    dn_ok3 = (g3 <= N0G - 2).astype(jnp.float32)
    if fd:
        jg3 = s1 + jj3
        links3 = (
            up_ok3
            + dn_ok3
            + (jg3 >= 1).astype(jnp.float32)
            + (jg3 <= N1 - 2).astype(jnp.float32)
            + (kk3 >= 1).astype(jnp.float32)
            + (kk3 <= N2 - 2).astype(jnp.float32)
        )
        diag3 = kappa2 + hinv2 * links3
    else:
        diag3 = dw[slot]

    c0lo, c0hi = fscal_ref[1], fscal_ref[2]
    c1lo, c1hi = fscal_ref[3], fscal_ref[4]
    c2lo, c2hi = fscal_ref[5], fscal_ref[6]

    # Axis-1/2 shifts zero-fill at window edges: correct at true domain
    # boundaries (always window edges), and harmless elsewhere because
    # only halo rows (discarded) see the window edge.
    def phase(color):
        xv = xw[slot]
        sumn3 = (
            c0lo * up_ok3 * _shift_plane(xv, 0, -1, W0)
            + c0hi * dn_ok3 * _shift_plane(xv, 0, 1, W0)
            + c1lo * _shift_plane(xv, 1, -1, W1)
            + c1hi * _shift_plane(xv, 1, 1, W1)
            + c2lo * _shift_plane(xv, 2, -1, N2)
            + c2hi * _shift_plane(xv, 2, 1, N2)
        )
        upd3 = (1.0 - omega) * xv + (omega / diag3) * (bt[slot] - sumn3)
        xw[slot] = jnp.where(par3 == color, upd3, xv)

    phase(color0)
    phase(1 - color0)

    base0 = pl.multiple_of(i0 * T0 - s0, 2)
    base1 = pl.multiple_of(i1 * T1 - s1, _JB)
    o_ref[:] = xw[slot, pl.ds(base0, T0), pl.ds(base1, T1)]


def _tile2d_auto(N0, N1, N2, streams, requested=None, h0=4):
    """(T0, T1) for the 2D-tiled kernels: the feasible tile with the
    least halo amplification (window/tile point ratio), tie-broken
    toward bigger tiles (fewer windows, better DMA amortisation).
    Windows are pure recompute overhead — both DMA bytes and VPU phase
    work scale with the window, so amplification is the right objective
    (measured at 768^3: chain (8,128) 60.1 ms -> (16,128) 49.5 ms,
    sweep (16,128) 36.8 ms -> (24,128) 33.1 ms).

    Caps are MEASURED on the attached v5e (2026-08-17):
    * window rows W0 <= 28 — (24,128) sweep windows (W0=28) compile in
      ~3 min; whole-window vector ops on much taller windows never
      finish Mosaic compile (CLAUDE.md), so W0 sits at the proven point;
    * window volume <= 2.4M points generally ((16,128) windows, 2.21M,
      compile in ~40 s), relaxed to 3.2M when W1 <= 144 — (24,128)
      sweep windows (3.10M, W1=144) compile, while (16,192) windows
      (3.19M, W1=208) never finish: WIDE windows are what blow up
      Mosaic compile time, not tall ones;
    * VMEM: (streams + 6) * window bytes <= VMEM_LIMIT — the +6 margin
      for phase temporaries matches the compiler's scoped-vmem
      accounting to ~0.2% (chain (16,128): predicted 116.6 MB,
      compiler reported 116.40 MB)."""
    if requested is not None:
        return requested
    budget = VMEM_LIMIT
    best = None
    for T0 in (24, 16, 8, 4, 2):
        if N0 % T0 or N0 < T0 + h0 or T0 + h0 > 28:
            continue
        for T1 in range(N1, _JB - 1, -_JB):
            if N1 % T1:
                continue
            W1 = min(T1 + 2 * _JB, N1)
            if W1 % _JB:
                continue
            vol = (T0 + h0) * W1 * N2
            if vol > (3_200_000 if W1 <= 144 else 2_400_000):
                continue
            if (streams + 6) * vol * 4 > budget:
                continue
            key = (vol / (T0 * T1 * N2), -T0 * T1)
            if best is None or key < best[0]:
                best = (key, (T0, T1))
    if best is None:
        raise ValueError(
            f"no feasible 2D tile for grid ({N0}, {N1}, {N2}) "
            f"(needs N1 % {_JB} == 0 and an in-budget window)"
        )
    return best[1]


@functools.partial(
    jax.jit,
    static_argnames=("sweep", "tile2d", "interpret", "with_noise", "n0_global"),
)
def fused_rb_gibbs_sweep_2d(
    x,
    b,
    diag,  # (N0, N1, N2) f32, or None when fd_params is given
    coeffs,  # (6,) f32
    omega,
    seed,
    step,
    noise_mult=1.0,
    sweep: str = "forward",
    tile2d: "tuple | None" = None,
    interpret: bool = False,
    with_noise: bool = True,
    fd_params=None,  # (2,) f32 (kappa2, hinv2): recompute diag in-kernel
    row_offset=0,  # global row of array row 0 (traced; shard_map use)
    n0_global: "int | None" = None,
):
    """One fused stochastic red/black SOR sweep, 2D-tiled for planes that
    exceed the whole-plane VMEM window (_PLANE_LIMIT points).

    Semantics match :func:`fused_rb_gibbs_sweep` /
    :func:`fused_rb_gibbs_sweep_fd`; only the noise keying differs (the
    stream is additionally keyed by the axis-1 _JB-block so tiles can
    regenerate it locally).  FD-form calls with no explicit tile
    auto-route to :func:`fused_rb_gibbs_sweep_2d_staged` (bit-identical,
    no axis-0 halo recompute) whenever a staged tile is feasible."""
    N0, N1, N2 = x.shape
    if n0_global is None:
        n0_global = N0
    fd = fd_params is not None
    if fd and tile2d is None:
        from parmgmc_tpu.kernels.mg_sweep import _tile2d_staged

        try:
            _tile2d_staged(N0, N1, N2, with_b=True, with_z=False)
            ok = True
        except ValueError:
            ok = False
        if ok:
            return fused_rb_gibbs_sweep_2d_staged(
                x,
                b,
                coeffs,
                omega,
                seed,
                step,
                noise_mult=noise_mult,
                sweep=sweep,
                interpret=interpret,
                with_noise=with_noise,
                fd_params=fd_params,
                row_offset=row_offset,
                n0_global=n0_global,
            )
    streams = 2 if fd else 3
    # double-buffered windows: each stream holds 2 slots
    T0, T1 = _tile2d_auto(N0, N1, N2, 2 * streams, tile2d)
    W0, W1 = T0 + 4, min(T1 + 2 * _JB, N1)
    if N0 % T0 or T0 % 2 or N0 < W0:
        raise ValueError(f"bad axis-0 tile {T0} for {N0}")
    if N1 % T1 or T1 % _JB or W1 % _JB:
        raise ValueError(f"bad axis-1 tile {T1} for {N1}")
    color0 = 0 if sweep == "forward" else 1

    if fd:
        k2, h2 = fd_params[0], fd_params[1]
    else:
        k2 = h2 = jnp.float32(0.0)
    fscal = jnp.concatenate(
        [
            jnp.asarray([omega], jnp.float32),
            jnp.asarray(coeffs, jnp.float32).reshape(6),
            jnp.asarray([noise_mult], jnp.float32),
            jnp.stack([jnp.asarray(k2, jnp.float32), jnp.asarray(h2, jnp.float32)]),
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
        _kernel_2d,
        T0=T0,
        T1=T1,
        shape=(N0, N1, N2),
        with_noise=with_noise,
        fd=fd,
        n0_global=n0_global,
    )
    win = pltpu.VMEM((2, W0, W1, N2), jnp.float32)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if fd:
        in_specs = [smem, smem, any_spec, any_spec]
        scratch = [win, win, pltpu.SemaphoreType.DMA((2, 2))]
        operands = (fscal, iscal, x, b)
    else:
        in_specs = [smem, smem, any_spec, any_spec, any_spec]
        scratch = [win, win, win, pltpu.SemaphoreType.DMA((3, 2))]
        operands = (fscal, iscal, x, b, diag)
    return pl.pallas_call(
        kern,
        grid=(N0 // T0, N1 // T1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (T0, T1, N2), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(*operands)


# ---------------------------------------------------------------------------
# v4: STAGED-SLAB 2D sweep (FD form only).
#
# The windowed v3 kernel above recomputes both colour phases over a
# halo-extended (T0+4, T1+16) window per tile.  This variant applies
# the staged-slab dataflow (kernels.mg_sweep._kernel_chain_2d_staged)
# to the plain sweep: grid (N1//T1, N0//T0 + 1) with axis 0 INNERMOST;
# each column strip walks down the grid carrying 2 rows per stage
# (x window, b~, phase-0 result), so every phase row is computed
# exactly once and each x/b byte is fetched once along axis 0 — only
# the in-plane halo (W1/T1) remains.  Same (row-pair, j-block)-keyed
# noise as v3: results are bit-identical.
# ---------------------------------------------------------------------------


def _kernel_2d_staged(
    fscal_ref,  # SMEM (10,) f32: omega, c0lo..c2hi, noise_mult, kappa2, hinv2
    iscal_ref,  # SMEM (4,) i32: seed, color0, step, row_off
    x_hbm,  # ANY (N0, N1, N2)
    b_hbm,  # ANY
    o_ref,  # VMEM (T0, T1, N2) block (max(i0-1,0), i1)
    xdma,  # scratch (2, T0, W1, N2) double-buffered blocks
    bdma,  # scratch (2, T0, W1, N2)
    xw,  # scratch (T0+2, W1, N2): x rows jT..jT+T0+1 (2-row carry)
    bt,  # scratch (T0+2, W1, N2): b~ rows jT..jT+T0+1; re-staged
    #     with the phase-1 output after its values die (column slices
    #     must be ref reads)
    p0,  # scratch (T0+2, W1, N2): phase-0 rows jT-1..jT+T0
    xprev,  # scratch (T0, W1, N2): block j
    bprev,  # scratch (T0, W1, N2)
    prow,  # scratch (3, W1, N2): strip prologue rows
    sem,  # DMA semaphores (2, 2)
    *,
    T0: int,
    T1: int,
    shape: tuple,
    with_noise: bool,
    n0_global: int,
):
    N0, N1, N2 = shape
    N0G = n0_global
    G0 = N0 // T0
    G1 = N1 // T1
    W1 = min(T1 + 2 * _JB, N1)
    i1 = pl.program_id(0)
    i0 = pl.program_id(1)  # innermost: strips walk down axis 0
    t = i1 * (G0 + 1) + i0
    slot = t % 2
    j = i0 - 1  # tile being produced
    jT = j * T0
    s1 = pl.multiple_of(jnp.clip(i1 * T1 - _JB, 0, N1 - W1), _JB)
    base1 = pl.multiple_of(i1 * T1 - s1, _JB)

    def copies(i1t, i0t, sl):
        s1t = pl.multiple_of(jnp.clip(i1t * T1 - _JB, 0, N1 - W1), _JB)
        r0t = pl.multiple_of(jnp.minimum(i0t, G0 - 1) * T0, 2)
        return [
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(r0t, T0), pl.ds(s1t, W1)],
                xdma.at[sl],
                sem.at[0, sl],
            ),
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(r0t, T0), pl.ds(s1t, W1)],
                bdma.at[sl],
                sem.at[1, sl],
            ),
        ]

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

    def geom(w, off):
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

    nq = W1 // _JB
    kkb = jax.lax.broadcasted_iota(jnp.int32, (_JB, N2), 1)
    lanes_ip = (kkb >= 1).astype(jnp.float32) + (kkb <= N2 - 2).astype(
        jnp.float32
    )
    jlb = jax.lax.broadcasted_iota(jnp.int32, (_JB, N2), 0)

    def add_noise(row_lo, g_lo, n_pairs):
        """Add (row-pair, j-block)-keyed noise to bt rows
        [row_lo, row_lo + 2*n_pairs) = global rows [g_lo, ...) —
        identical keying to the windowed v3 kernel."""

        def blk(tq, _):
            c = tq // nq
            q = tq - c * nq
            l = row_lo + 2 * c
            off = q * _JB
            g = g_lo + row_off + 2 * c
            jb = s1 // _JB + q
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

            bt[l, pl.ds(off, _JB)] = bt[l, pl.ds(off, _JB)] + (
                nscale * jnp.sqrt(dslab(g)) * ee
            )
            bt[l + 1, pl.ds(off, _JB)] = bt[l + 1, pl.ds(off, _JB)] + (
                nscale * jnp.sqrt(dslab(g + 1)) * eo
            )
            return 0

        jax.lax.fori_loop(0, n_pairs * nq, blk, 0, unroll=False)

    @pl.when(i0 == 1)
    def _prologue():
        # Prime the strip carries: x rows 0..1, b~ rows 0..1, phase-0
        # rows -1..0 (row -1 zero; its contributions are masked by
        # up_ok at the true boundary and land in the discarded halo for
        # sharded callers — the chain-kernel contract).
        xw[0] = xprev[0]
        xw[1] = xprev[1]
        bt[0] = bprev[0]
        bt[1] = bprev[1]
        if with_noise:
            add_noise(0, 0, 1)
        prow[0] = jnp.zeros((W1, N2), jnp.float32)
        prow[1] = xprev[0]
        prow[2] = xprev[1]
        _, diag3, up3, dn3 = geom(3, -1)  # rows -1..1 (jT = 0 here)
        pv3 = prow[:]
        nsum = neigh_sum(pv3, 3, up3, dn3)
        upd0 = (1.0 - omega) * pv3[1] + (omega / diag3[1]) * (
            bt[0] - nsum[1]
        )
        p0[0] = jnp.zeros((W1, N2), jnp.float32)
        p0[1] = jnp.where(plane_par == color0, upd0, pv3[1])

    @pl.when(i0 > 0)
    def _compute():
        # ---- fresh x rows jT+2 .. jT+T0+1 --------------------------------
        xw[pl.ds(2, T0 - 2)] = xprev[pl.ds(2, T0 - 2)]
        xw[pl.ds(T0, 2)] = xdma[slot, pl.ds(0, 2)]

        # ---- fresh b~ rows jT+2 .. jT+T0+1 -------------------------------
        bt[pl.ds(2, T0 - 2)] = bprev[pl.ds(2, T0 - 2)]
        bt[pl.ds(T0, 2)] = bdma[slot, pl.ds(0, 2)]
        if with_noise:
            add_noise(2, jT + 2, T0 // 2)

        # ---- phase 0: fresh rows jT+1 .. jT+T0 from the x window --------
        par, diag, up, dn = geom(T0 + 2, 0)  # xw rows jT..jT+T0+1
        xv = xw[:]
        btv = bt[:]
        upd = (1.0 - omega) * xv + (omega / diag) * (
            btv - neigh_sum(xv, T0 + 2, up, dn)
        )
        sel = jnp.where(par == color0, upd, xv)
        p0[pl.ds(2, T0)] = sel[1 : T0 + 1]

        # ---- phase 1 on the p0 window rows jT-1 .. jT+T0 ------------------
        par1, diag1, up1, dn1 = geom(T0 + 2, -1)
        pv = p0[:]
        # b~ aligned to the p0 window: index i holds row jT-1+i (row 0
        # garbage, discarded — outputs span window rows 1..T0)
        btw = _shift_plane(btv, 0, -1, T0 + 2)
        upd1 = (1.0 - omega) * pv + (omega / diag1) * (
            btw - neigh_sum(pv, T0 + 2, up1, dn1)
        )
        out_full = jnp.where(par1 == (1 - color0), upd1, pv)

        # ---- carries for the next stage (values above already read) ------
        xw[pl.ds(0, 2)] = xw[pl.ds(T0, 2)]
        p0[pl.ds(0, 2)] = p0[pl.ds(T0, 2)]
        bt[pl.ds(0, 2)] = bt[pl.ds(T0, 2)]

        # ---- output staged through bt rows 2..T0+1 (dead) -----------------
        bt[pl.ds(2, T0)] = out_full[1 : T0 + 1]
        o_ref[:] = bt[pl.ds(2, T0), pl.ds(base1, T1)]

    @pl.when(i0 == 0)
    def _init():
        o_ref[:] = xdma[slot, :, pl.ds(base1, T1)]  # overwritten at i0=1

    @pl.when(i0 < G0)
    def _slide():
        xprev[:] = xdma[slot]
        bprev[:] = bdma[slot]


@functools.partial(
    jax.jit,
    static_argnames=("sweep", "tile2d", "interpret", "with_noise", "n0_global"),
)
def fused_rb_gibbs_sweep_2d_staged(
    x,
    b,
    coeffs,  # (6,) f32
    omega,
    seed,
    step,
    noise_mult=1.0,
    sweep: str = "forward",
    tile2d: "tuple | None" = None,
    interpret: bool = False,
    with_noise: bool = True,
    fd_params=None,  # (2,) f32 (kappa2, hinv2) — REQUIRED (FD form only)
    row_offset=0,
    n0_global: "int | None" = None,
):
    """One fused stochastic red/black SOR sweep, STAGED-SLAB 2D tiling.

    Bit-identical results to :func:`fused_rb_gibbs_sweep_2d` (same
    formulas and noise keying) without its axis-0 halo re-fetch and
    phase recompute; FD-form operators only (the diag-streamed mode
    stays on the windowed kernel)."""
    if fd_params is None:
        raise ValueError("staged 2D sweep is FD-form only")
    N0, N1, N2 = x.shape
    if n0_global is None:
        n0_global = N0
    from parmgmc_tpu.kernels.mg_sweep import _tile2d_staged

    T0, T1 = _tile2d_staged(
        N0, N1, N2, with_b=True, with_z=False, requested=tile2d
    )
    W1 = min(T1 + 2 * _JB, N1)
    if N0 % T0 or T0 % 2 or T0 < 4 or N0 < 2 * T0:
        raise ValueError(f"bad axis-0 tile {T0} for {N0}")
    if N1 % T1 or T1 % _JB or W1 % _JB:
        raise ValueError(f"bad axis-1 tile {T1} for {N1}")
    G0, G1 = N0 // T0, N1 // T1
    color0 = 0 if sweep == "forward" else 1

    fscal = jnp.concatenate(
        [
            jnp.asarray([omega], jnp.float32),
            jnp.asarray(coeffs, jnp.float32).reshape(6),
            jnp.asarray([noise_mult], jnp.float32),
            jnp.asarray(fd_params, jnp.float32).reshape(2),
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
        _kernel_2d_staged,
        T0=T0,
        T1=T1,
        shape=(N0, N1, N2),
        with_noise=with_noise,
        n0_global=n0_global,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((2, T0, W1, N2), jnp.float32),  # xdma
        pltpu.VMEM((2, T0, W1, N2), jnp.float32),  # bdma
        pltpu.VMEM((T0 + 2, W1, N2), jnp.float32),  # xw
        pltpu.VMEM((T0 + 2, W1, N2), jnp.float32),  # bt
        pltpu.VMEM((T0 + 2, W1, N2), jnp.float32),  # p0
        pltpu.VMEM((T0, W1, N2), jnp.float32),  # xprev
        pltpu.VMEM((T0, W1, N2), jnp.float32),  # bprev
        pltpu.VMEM((3, W1, N2), jnp.float32),  # prow
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    return pl.pallas_call(
        kern,
        grid=(G1, G0 + 1),
        in_specs=[smem, smem, any_spec, any_spec],
        out_specs=pl.BlockSpec(
            (T0, T1, N2),
            lambda i1, i0: (jnp.maximum(i0 - 1, 0), i1, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(fscal, iscal, x, b)


def fused_sweep_supported(shape) -> bool:
    """Can the fused sweep kernels (1D whole-plane or 2D-tiled) serve a
    3D grid of this shape?  (Plane-size half of the eligibility test —
    the operator-form half lives in samplers.gibbs._fused_eligible.)"""
    N0, N1, N2 = shape
    if N1 * N2 <= _PLANE_LIMIT:
        return True
    if N1 % _JB:
        return False
    try:
        # worst case: diag-streamed mode with double-buffered windows
        # holds 2*3 stream slots (must match the wrappers' 2*streams).
        # (The staged-slab sweep's envelope is essentially the same, so
        # this one probe gates both variants; staged is FD-form only
        # and auto-falls back to this windowed kernel anyway.)
        _tile2d_auto(N0, N1, N2, streams=6)
        return True
    except ValueError:
        return False
