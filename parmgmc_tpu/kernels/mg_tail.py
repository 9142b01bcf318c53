"""Fused MGMC coarse-tail kernel: every sub-128-lane level in ONE launch.

Below the fused sweep kernels' 128-lane floor (64^3 and coarser on the
flagship hierarchy) the keyed V-cycle falls back to per-level lax
programs — noise, masked sweep, residual, restriction, and the up-phase
adds each dispatch separately.  The arrays are tiny (<= 1 MB), so the
cost is pure program-count overhead: measured 0.17-0.19 ms of the
1.33 ms 256^3 step (BENCH_NOTES "Negative results" breakdown), spread
across ~15 launches with no single hot item.  This kernel runs ALL
smoothed tail levels' down-phases (stochastic RHS + from-zero red/black
sweep + residual + 2x2x2 aggregate restriction, the same math as
``kernels.mg_sweep``; reference hot path ``/root/reference/src/
mc_sor.c:241-296`` + ``src/pc_gamgmc.c:227-264``) in one ``pallas_call``
with every intermediate living in VMEM.

Layout: Mosaic has no lane-compacting ops (gathers are same-width vreg
shuffles only — BENCH_NOTES "Mosaic gather/DMA constraints"), so levels
cannot shrink the lane dim as they coarsen.  Instead every tail level
is stored DUPLICATED to a fixed (n0_l, S1, 128) box: sublanes carry
each true row g = S1/n1_l times, lanes carry each true cell
f = 128/n2_l times.  All stencil ops survive duplication:

* neighbour shifts become shifts by (1, g, f) with zero fill,
* the aggregate restriction's in-plane pair sums become BLOCK-SWAP adds
  ``r + swap(adjacent g- or f-blocks)`` (a shift plus a parity select —
  the sum lands duplicated across the merged block, which IS the next
  level's layout),
* the axis-0 pair sum is a leading-dim fold (reshape on untiled dims),
* prolongation onto a finer tail level is ``jnp.repeat(z, 2, axis=0)``
  alone (sublane/lane duplication is already encoded).

Noise is generated per TRUE dof from a splitmix hash of
(seed, step, level, flat index) — plain vector integer ops (no
``prng_seed``), so duplicated slots regenerate identical draws by
construction and the full stochastic path runs under CPU interpret
mode, unlike the row-seeded hardware-PRNG kernels.

The dense coarse sample and the (tiny) up-phase adds stay in XLA: the
coarse matvec needs a lane-compacted vector, which the layout cannot
produce in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parmgmc_tpu.kernels.rb_gibbs import (
    _compiler_params,
    _mix,
    _shift_plane,
    _sincos2pi,
)

__all__ = ["fused_tail_down", "tail_down_reference"]

LANES = 128


def _blockswap(a, axis, f):
    """Swap adjacent f-wide blocks along ``axis`` (f | extent/2)."""
    if f == a.shape[axis]:  # single block pair cannot exist
        raise ValueError("blockswap needs >= 2 blocks")
    up = _shift_plane(a, axis, f, a.shape[axis])
    dn = _shift_plane(a, axis, -f, a.shape[axis])
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    return jnp.where((idx // f) % 2 == 0, up, dn)


def _eta_hash(su, stepu, li, idx, bitcast):
    """One N(0,1) draw per (duplicated) true-dof index via splitmix hash
    + Box-Muller (cos branch).  ``bitcast`` adapts to the execution
    context (pltpu.bitcast in-kernel, lax.bitcast_convert_type in the
    reference twin) — both are bit-level u32->s32 views."""
    h1 = _mix(_mix(_mix(su, stepu), jnp.uint32(0xA511E9B3) + li), idx)
    h2 = _mix(h1, jnp.uint32(0x63D83595))
    u1 = bitcast(h1 >> 9, jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 23)
    ) + 1e-7
    u2 = bitcast(h2 >> 9, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 23))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    c, _ = _sincos2pi(u2)
    return r * c


def _tail_levels(cur, shapes, S1, omegas, kappa2s, hinv2s, su, stepu,
                 color0, with_noise, bitcast):
    """Shared math for the kernel body and the pure-JAX twin.

    cur: entry RHS in (n0_0, S1, 128) duplicated layout.
    Returns ([y_0 .. y_{L-1}], coarse_rhs), all in duplicated layouts.
    """
    ys = []
    L = len(shapes) - 1
    for li in range(L):
        n0, n1, n2 = shapes[li]
        g, f = S1 // n1, LANES // n2
        omega = omegas[li]
        kappa2 = kappa2s[li]
        hinv2 = hinv2s[li]
        shp = (n0, S1, LANES)
        ii = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, shp, 1) // g
        kk = jax.lax.broadcasted_iota(jnp.int32, shp, 2) // f
        par = (ii + jj + kk) % 2
        links = (
            (ii >= 1).astype(jnp.float32)
            + (ii <= n0 - 2).astype(jnp.float32)
            + (jj >= 1).astype(jnp.float32)
            + (jj <= n1 - 2).astype(jnp.float32)
            + (kk >= 1).astype(jnp.float32)
            + (kk <= n2 - 2).astype(jnp.float32)
        )
        diag = kappa2 + hinv2 * links
        winv = omega / diag

        def neigh(v, g=g, f=f):
            # FD star: all off-diagonals are -hinv2; zero fill at true
            # edges contributes exactly the missing links
            return -hinv2 * (
                _shift_plane(v, 0, -1, v.shape[0])
                + _shift_plane(v, 0, 1, v.shape[0])
                + _shift_plane(v, 1, -g, S1)
                + _shift_plane(v, 1, g, S1)
                + _shift_plane(v, 2, -f, LANES)
                + _shift_plane(v, 2, f, LANES)
            )

        bt = cur
        if with_noise:
            idx = (ii * (n1 * n2) + jj * n2 + kk).astype(jnp.uint32)
            eta = _eta_hash(su, stepu, jnp.uint32(li), idx, bitcast)
            nscale = jnp.sqrt((2.0 - omega) / omega)
            bt = cur + nscale * jnp.sqrt(diag) * eta

        # from-zero red/black sweep (two phases, in value form)
        v0 = jnp.where(par == color0, winv * bt, bt)
        y = jnp.where(par == (1 - color0), winv * (v0 - neigh(v0)), v0)
        ys.append(y)

        # restricted residual of the NOISE-FREE rhs (mg_sweep semantics)
        r = cur - (diag * y + neigh(y))
        r = r.reshape(n0 // 2, 2, S1, LANES).sum(1)  # axis-0 true pairs
        r = r + _blockswap(r, 1, g)  # axis-1 pairs -> dup 2g
        r = r + _blockswap(r, 2, f)  # lane pairs -> dup 2f
        cur = r
    return ys, cur


def _kernel_tail(fscal_ref, iscal_ref, b_ref, *out_refs, shapes, S1,
                 with_noise):
    L = len(shapes) - 1
    su = iscal_ref[0].astype(jnp.uint32)
    stepu = iscal_ref[1].astype(jnp.uint32)
    color0 = iscal_ref[2]
    omegas = [fscal_ref[3 * li] for li in range(L)]
    kappa2s = [fscal_ref[3 * li + 1] for li in range(L)]
    hinv2s = [fscal_ref[3 * li + 2] for li in range(L)]
    ys, rhs = _tail_levels(
        b_ref[:], shapes, S1, omegas, kappa2s, hinv2s, su, stepu,
        color0, with_noise, pltpu.bitcast,
    )
    for li in range(L):
        out_refs[li][:] = ys[li]
    out_refs[L][:] = rhs


@functools.partial(
    jax.jit, static_argnames=("shapes", "with_noise", "interpret")
)
def fused_tail_down(
    bl_layout,  # (n0_0, S1, 128) f32: entry RHS, duplicated layout
    level_params,  # (3L,) f32: per level omega, kappa2, hinv2
    seed,  # int32 scalar
    step,  # int32 scalar
    color0,  # int32 scalar: 0 forward, 1 backward
    shapes: tuple,  # L smoothed true shapes + the coarse true shape
    with_noise: bool = True,
    interpret: bool = False,
):
    """([y_0..y_{L-1}], coarse_rhs): the whole MGMC tail down-phase.

    Shapes are TRUE per-level grid shapes (entry first, coarsest last);
    outputs come back in the duplicated (n0_l, S1, 128) layouts (see
    module docstring).  ``coarse_rhs[:, ::g_c, ::f_c]`` is the true
    coarsest RHS.
    """
    n0_0, S1, lanes = bl_layout.shape
    assert lanes == LANES
    L = len(shapes) - 1
    out_shape = [
        jax.ShapeDtypeStruct((shapes[li][0], S1, LANES), jnp.float32)
        for li in range(L)
    ] + [jax.ShapeDtypeStruct((shapes[L][0], S1, LANES), jnp.float32)]
    iscal = jnp.stack(
        [
            jnp.asarray(seed, jnp.int32),
            jnp.asarray(step, jnp.int32),
            jnp.asarray(color0, jnp.int32),
        ]
    )
    kern = functools.partial(
        _kernel_tail, shapes=tuple(shapes), S1=S1, with_noise=with_noise
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        in_specs=[smem, smem, vmem],
        out_specs=[vmem] * (L + 1),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(jnp.asarray(level_params, jnp.float32), iscal, bl_layout)
    return list(outs[:L]), outs[L]


def tail_down_reference(
    bl_layout, level_params, seed, step, color0, shapes, with_noise=True
):
    """Pure-JAX twin of :func:`fused_tail_down` (bit-level identical
    math; used to test the Mosaic lowering)."""
    S1 = bl_layout.shape[1]
    L = len(shapes) - 1
    p = jnp.asarray(level_params, jnp.float32)
    su = jnp.asarray(seed, jnp.int32).astype(jnp.uint32)
    stepu = jnp.asarray(step, jnp.int32).astype(jnp.uint32)
    bc = lambda v, dt: jax.lax.bitcast_convert_type(v, dt)
    ys, rhs = _tail_levels(
        bl_layout,
        tuple(shapes),
        S1,
        [p[3 * li] for li in range(L)],
        [p[3 * li + 1] for li in range(L)],
        [p[3 * li + 2] for li in range(L)],
        su,
        stepu,
        jnp.asarray(color0, jnp.int32),
        with_noise,
        bc,
    )
    return ys, rhs
