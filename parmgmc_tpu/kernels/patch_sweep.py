"""Fused coloured vertex-star patch-Gibbs sweep (squared FD operators).

One Pallas kernel runs the ENTIRE 125-colour block-Gibbs sweep of
:class:`~parmgmc_tpu.samplers.patch_gibbs.PatchGibbsSampler` for
squared link-count FD operators A = F^2, F = kappa2 + hinv2 * links
(the reference's squared-operator prior regime, ex9.py:48-66) with the
chain state RESIDENT in VMEM for the whole sweep:

* the XLA path pays ~0.7 ms of fixed loop-body-kernel overhead per
  colour pass plus pad/reshape/stride view chains (measured 3.4 s/sweep
  at 128^3, CLAUDE.md) — here the colour x row-group loop is a single
  ``fori_loop`` inside ONE kernel launch: no per-pass dispatch, no HBM
  traffic between passes;
* every A^2 patch entry is reconstructed in closed form from
  (kappa2, hinv2) and in-grid masks (see ``_ass`` below), so the only
  HBM streams are x in, b in, x out — the 24 array-valued coefficient
  channels of the assembled radius-2 stencil never exist;
* the 7x7 patch systems run as the same unrolled structure-of-arrays
  Cholesky as the lax path, on (8-center-row, N1, N2) slabs — whole
  vector ops, no gathers;
* patch noise is drawn on chip, keyed by (seed, step, colour/group,
  member pair) — the counter-PRNG + folded Box-Muller machinery of
  kernels.rb_gibbs.

Layout trick: centers of a colour live on a stride-5 row lattice, so a
contiguous 40-row window reshaped to (8 centers, 5, N1, N2) makes
"member row of center t" a STATIC middle index — the stride-5
selection costs nothing.

Exactness: every patch update is the exact conditional (verified
against the lax sampler deterministically in interpret mode and
statistically on chip); colours are processed in the lax path's order
and row groups within a colour are independent (same-colour centers
are 5 apart; updates reach 1, reads reach 3).

Same-colour correctness argument as mc_sor's colouring (multicolour
independence), patch systems as pc_chols' LAPACK fast path
(pc_chols.c:174-194) — rebuilt as vector ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parmgmc_tpu.kernels.rb_gibbs import (
    VMEM_LIMIT,
    _compiler_params,
    _mix,
    _sincos2pi,
)

__all__ = [
    "fused_patch_sweep_sqfd",
    "fused_patch_sweep_sqfd_streamed",
    "patch_sweep_supported",
    "patch_sweep_streaming_supported",
    "streaming_enabled",
]

# The round-4 streaming kernel crashed the TPU worker at real lowering
# (VERDICT r4 #1).  Round-5 bisection (probe_streamed_dma*.py): the
# ANY-space-output / read-from-output / HBM->HBM-seed-copy machinery is
# all green on-chip; the fault was the UNALIGNED SUBLANE EXTENT of the
# round-4 selftest shape (N1=10) — manual window DMAs need N1 % 8 == 0,
# now enforced by patch_sweep_streaming_supported.  With the gate in
# place `bench.py --selftest-patch` passes 3/3 on the real chip
# (2026-08-21: det A/B bitwise 0.0 at (16,16,128); 256^3 streaming
# sweep 176.4 ms vs ~27 s lax), so production routing is ON.
import os as _os

_STREAMING_VALIDATED = True  # bench.py --selftest-patch 3/3 green 2026-08-21


def streaming_enabled() -> bool:
    """May PatchGibbsSampler.create auto-route past-resident grids to
    the HBM-streaming kernel?  Off until on-chip validated (or forced
    via PARMGMC_STREAMED_PATCH=1/0)."""
    env = _os.environ.get("PARMGMC_STREAMED_PATCH")
    if env is not None:
        return env not in ("0", "false", "")
    return _STREAMING_VALIDATED

# member offsets of a vertex star (center first) — must match
# PatchGibbsSampler.create's ordering
_MEMBERS = (
    (0, 0, 0),
    (-1, 0, 0),
    (1, 0, 0),
    (0, -1, 0),
    (0, 1, 0),
    (0, 0, -1),
    (0, 0, 1),
)
_K = len(_MEMBERS)
_M = 5  # colour base (radius 2 + 3)
_TC = 8  # center rows per group (VMEM-resident kernel)
_STRIDE = _M * _TC  # 40 rows of centers per group
_W = _STRIDE + 6  # window rows: members (+-1) + stencil reach (+-2)

# live slab temporaries of one group pass, in units of (tc, N1, N2)
# floats (masks/xs/rs/ds/lk/A/rhs/Lf/z/y peak liveness; measured model
# from patch_sweep_supported round 3)
_SLAB_TEMPS = 70


def _shiftp(a, axis, by):
    """a[..., i+by, ...] with zero fill (in-plane axes of a slab)."""
    if by == 0:
        return a
    pads = [(0, 0)] * a.ndim
    pads[axis] = (max(0, -by), max(0, by))
    ap = jnp.pad(a, pads)
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(max(0, by), max(0, by) + a.shape[axis])
    return ap[tuple(sl)]


def _shift0(v, by):
    """v[u+by] along the leading (window-row) axis, zero fill."""
    n = v.shape[0]
    if by == 0:
        return v
    z = jnp.zeros((abs(by), *v.shape[1:]), v.dtype)
    if by > 0:
        return jnp.concatenate([v[by:], z], axis=0)
    return jnp.concatenate([z, v[:by]], axis=0)


def _eta_slab(h, n1, n2, tc=_TC):
    """Two N(0,1) (tc, n1, n2) slabs from hash h (counter PRNG +
    folded Box-Muller, see rb_gibbs)."""
    pltpu.prng_seed(h.astype(jnp.int32))
    bits = pltpu.bitcast(
        pltpu.prng_random_bits((2, tc * n1, n2)), jnp.uint32
    )
    hi1 = pltpu.bitcast(bits[0] >> 9, jnp.int32)
    hi2 = pltpu.bitcast(bits[1] >> 9, jnp.int32)
    u1 = hi1.astype(jnp.float32) * (1.0 / (1 << 23)) + 1e-7
    u2 = hi2.astype(jnp.float32) * (1.0 / (1 << 23))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    c, s = _sincos2pi(u2)
    e1 = (r * c).reshape(tc, n1, n2)
    e2 = (r * s).reshape(tc, n1, n2)
    return e1, e2


def _group_slab(
    xw,  # (W, N1, N2) window VALUES (W = 5*tc + 6)
    bw,  # (W, N1, N2) RHS window values (zeros for b=None)
    i,  # flat colour*n_groups + g index (noise keying)
    c,
    g,
    k2,
    h2,
    su,
    stepu,
    *,
    shape,
    tc,
    with_noise,
):
    """One (colour, row-group) patch pass on a window slab: returns the
    updated (5*tc, N1, N2) member slab.  Shared by the VMEM-resident
    kernel (window read straight from the resident out_ref) and the
    round-4 STREAMING kernel (window DMA'd from HBM)."""
    N0, N1, N2 = shape
    stride = _M * tc
    W = stride + 6
    f32 = jnp.float32
    a0 = c // (_M * _M)
    a1 = (c // _M) % _M
    a2 = c % _M

    j1 = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 1)
    uarange = jax.lax.broadcasted_iota(jnp.int32, (W, 1, 1), 0)

    if True:  # (kept at the old body's indentation depth)
        # global row of window index u
        gr = (a0 + stride * g - 3) + uarange  # (W,1,1)
        inrow = ((gr >= 0) & (gr <= N0 - 1)).astype(f32)
        lnk = (
            (gr >= 1).astype(f32)
            + (gr <= N0 - 2).astype(f32)
            + ((j1 >= 1).astype(f32) + (j1 <= N1 - 2).astype(f32))[None]
            + ((j2 >= 1).astype(f32) + (j2 <= N2 - 2).astype(f32))[None]
        )
        dw = k2 + h2 * lnk  # diag of the BASE operator F

        # F x on the window (x is zero outside the grid: padded rows and
        # zero-filled in-plane shifts), then res = b - F(Fx).
        def fapply(v):
            out = dw * v - h2 * (
                _shift0(v, -1)
                + _shift0(v, 1)
                + _shiftp(v, 1, -1)
                + _shiftp(v, 1, 1)
                + _shiftp(v, 2, -1)
                + _shiftp(v, 2, 1)
            )
            return out * inrow  # truncate rows outside the grid

        fx = fapply(xw)
        res = bw - fapply(fx)

        # colour masks
        mplane = ((j1 % _M == a1) & (j2 % _M == a2)).astype(f32)
        crow = (a0 + stride * g) + _M * jax.lax.broadcasted_iota(
            jnp.int32, (tc, 1, 1), 0
        )
        cvalid = (crow <= N0 - 1).astype(f32)  # crow >= 0 always
        center_m = cvalid * mplane[None]

        def sel(v, o):
            """(TC, N1, N2): value of window-array v at member offset o
            from each center (static stride-5 row select by reshape)."""
            s = v[1 + o[0] : 1 + o[0] + stride]
            s = s.reshape(tc, _M, N1, N2)[:, 2]
            return _shiftp(_shiftp(s, 1, o[1]), 2, o[2])

        # member in-grid masks (center validity folded in)
        def ingrid(o):
            okr = ((crow + o[0] >= 0) & (crow + o[0] <= N0 - 1)).astype(f32)
            okp = jnp.ones((N1, N2), f32)
            if o[1]:
                okp = okp * _shiftp(
                    jnp.ones((N1, N2), f32), 0, o[1]
                )
            if o[2]:
                okp = okp * _shiftp(jnp.ones((N1, N2), f32), 1, o[2])
            return okr * okp[None]

        masks = [center_m * ingrid(o) for o in _MEMBERS]
        xs = [sel(xw, o) for o in _MEMBERS]
        rs = [sel(res, o) for o in _MEMBERS]
        ds = [sel(dw, o) for o in _MEMBERS]
        lk = [sel(lnk, o) for o in _MEMBERS]

        # A^2 patch entries in closed form (module docstring):
        #   diag:      d(p)^2 + h2^2 * links(p)
        #   |dp| = e:  -h2 (d(p) + d(q))
        #   |dp| = 2e: h2^2                     (path via the center)
        #   e_a+-e_b:  h2^2 (1 + in(c+o_i+o_j)) (center + corner paths)
        def ass(i_, j_):
            if i_ == j_:
                return (ds[i_] * ds[i_] + h2 * h2 * lk[i_]) * masks[i_] + (
                    1.0 - masks[i_]
                )
            oi, oj = _MEMBERS[i_], _MEMBERS[j_]
            rel = tuple(b_ - a_ for a_, b_ in zip(oi, oj))
            l1 = sum(abs(q) for q in rel)
            mm = masks[i_] * masks[j_]
            if l1 == 1:
                return -h2 * (ds[i_] + ds[j_]) * mm
            axes_ = [ax for ax in range(3) if rel[ax]]
            if len(axes_) == 1:  # 2e apart, path via the center
                return (h2 * h2) * mm
            # mixed: paths via center and via the corner c + oi + oj
            corner = tuple(a_ + b_ for a_, b_ in zip(oi, oj))
            return (h2 * h2) * (1.0 + ingrid(corner)) * mm

        A = [[None] * _K for _ in range(_K)]
        for i_ in range(_K):
            for j_ in range(i_ + 1):
                A[i_][j_] = ass(i_, j_)

        # rhs_i = mask_i * res_i + (A_SS x_S)_i
        rhs = []
        for i_ in range(_K):
            acc = masks[i_] * rs[i_]
            for j_ in range(_K):
                e = A[i_][j_] if j_ <= i_ else A[j_][i_]
                acc = acc + e * xs[j_]
            rhs.append(acc)

        # unrolled elementwise Cholesky + solves (SoA, as the lax path)
        Lf = [[None] * _K for _ in range(_K)]
        for i_ in range(_K):
            for j_ in range(i_ + 1):
                s = A[i_][j_]
                for t_ in range(j_):
                    s = s - Lf[i_][t_] * Lf[j_][t_]
                if i_ == j_:
                    Lf[i_][i_] = jnp.sqrt(s)
                else:
                    Lf[i_][j_] = s / Lf[j_][j_]

        z = []
        for i_ in range(_K):
            s = rhs[i_]
            for j_ in range(i_):
                s = s - Lf[i_][j_] * z[j_]
            z.append(s / Lf[i_][i_])

        if with_noise:
            ets = []
            for p_ in range((_K + 1) // 2):
                h = _mix(_mix(su, stepu), i.astype(jnp.uint32))
                e1, e2 = _eta_slab(
                    _mix(h, jnp.uint32(p_)), N1, N2, tc=tc
                )
                ets += [e1, e2]
            ets = ets[:_K]
        else:
            ets = [jnp.zeros((tc, N1, N2), f32)] * _K

        y = [None] * _K
        for i_ in reversed(range(_K)):
            s = z[i_] + ets[i_]
            for j_ in range(i_ + 1, _K):
                s = s - Lf[j_][i_] * y[j_]
            y[i_] = s / Lf[i_][i_]

        # scatter back: rebuild the 40-row member slab with masked
        # member updates (same-colour patches never collide)
        S = xw[1 : 1 + stride].reshape(tc, _M, N1, N2)
        rows = [S[:, m_] for m_ in range(_M)]
        for i_, o in enumerate(_MEMBERS):
            m_ = 2 + o[0]
            upd = _shiftp(
                _shiftp(jnp.where(masks[i_] > 0.5, y[i_], 0.0), 1, -o[1]),
                2,
                -o[2],
            )
            mb = _shiftp(_shiftp(masks[i_], 1, -o[1]), 2, -o[2])
            rows[m_] = jnp.where(mb > 0.5, upd, rows[m_])
        Sn = jnp.concatenate(
            [r[:, None] for r in rows], axis=1
        ).reshape(stride, N1, N2)
        return Sn


def _kernel(
    fscal_ref,  # SMEM (2,) f32: kappa2, hinv2
    iscal_ref,  # SMEM (2,) i32: seed, step
    xp_ref,  # (NP, N1, N2) padded x (VMEM)
    bp_ref,  # (NP, N1, N2) padded b (VMEM)
    out_ref,  # (NP, N1, N2)
    *,
    shape,
    pad_lo,
    n_groups,
    with_noise,
):
    """Whole-array VMEM-resident sweep: all 125 colours in one launch."""
    k2 = fscal_ref[0]
    h2 = fscal_ref[1]
    su = iscal_ref[0].astype(jnp.uint32)
    stepu = iscal_ref[1].astype(jnp.uint32)

    out_ref[...] = xp_ref[...]

    def body(i, _):
        c = i // n_groups
        g = i % n_groups
        a0 = c // (_M * _M)
        w0 = pad_lo + a0 + _STRIDE * g - 3
        xw = out_ref[pl.dslice(w0, _W)]
        bw = bp_ref[pl.dslice(w0, _W)]
        Sn = _group_slab(
            xw, bw, i, c, g, k2, h2, su, stepu,
            shape=shape, tc=_TC, with_noise=with_noise,
        )
        out_ref[pl.dslice(w0 + 1, _STRIDE)] = Sn
        return 0

    jax.lax.fori_loop(0, (_M**3) * n_groups, body, 0)


def _kernel_streamed(
    fscal_ref,  # SMEM (2,) f32
    iscal_ref,  # SMEM (2,) i32
    *refs,  # x_hbm [, b_hbm], out_hbm, xw, [bw,] snw, sem
    shape,
    pad_lo,
    n_groups,
    tc,
    with_noise,
    with_b,
):
    """STREAMING sweep (round 4): state in HBM, one (colour, row-group)
    window in VMEM at a time.  No input/output aliasing is used: grid
    step 0 seeds the ANY-space output buffer with a whole-buffer
    HBM->HBM copy of the padded input, and every later window read DMAs
    from that output buffer — so each read observes every previous
    step's write-back.  Grid steps are sequential ("arbitrary"
    semantics) and both DMAs complete inside the body, which serializes
    the read-window overlap between consecutive groups of a colour.
    Group-size tc shrinks with the plane so the ~70 live slab
    temporaries fit VMEM at any N0 — this is what lifts the 160^3
    resident ceiling (PARITY "Known gaps") to arbitrary N1%8==0 sizes."""
    if with_b:
        x_hbm, b_hbm, out_hbm, xw, bw, snw, sem = refs
    else:
        x_hbm, out_hbm, xw, snw, sem = refs
        b_hbm = bw = None
    stride = _M * tc
    W = stride + 6
    k2 = fscal_ref[0]
    h2 = fscal_ref[1]
    su = iscal_ref[0].astype(jnp.uint32)
    stepu = iscal_ref[1].astype(jnp.uint32)

    i = pl.program_id(0)
    c = i // n_groups
    g = i - c * n_groups
    a0 = c // (_M * _M)
    w0 = pad_lo + a0 + stride * g - 3

    # first grid step: seed the output buffer with the padded input
    # (whole-buffer HBM->HBM DMA; aliasing the input was the obvious
    # alternative but ANY-output aliasing is untried on this toolchain)
    @pl.when(i == 0)
    def _init():
        cp0 = pltpu.make_async_copy(x_hbm, out_hbm, sem.at[0])
        cp0.start()
        cp0.wait()

    inc = pltpu.make_async_copy(out_hbm.at[pl.ds(w0, W)], xw, sem.at[0])
    inc.start()
    if with_b:
        bc = pltpu.make_async_copy(b_hbm.at[pl.ds(w0, W)], bw, sem.at[1])
        bc.start()
    inc.wait()
    if with_b:
        bc.wait()
    bwv = (
        bw[...]
        if with_b
        else jnp.zeros((W, shape[1], shape[2]), jnp.float32)
    )
    Sn = _group_slab(
        xw[...], bwv, i, c, g, k2, h2, su, stepu,
        shape=shape, tc=tc, with_noise=with_noise,
    )
    snw[...] = Sn
    outc = pltpu.make_async_copy(
        snw, out_hbm.at[pl.ds(w0 + 1, stride)], sem.at[2]
    )
    outc.start()
    outc.wait()


def patch_sweep_supported(shape) -> bool:
    """3D, lane dim % 128, and x+b+window temporaries within VMEM
    (whole-array resident kernel: ~3 copies of the grid + ~60
    (8, N1, N2) slabs)."""
    if len(shape) != 3:
        return False
    N0, N1, N2 = shape
    if N2 % 128 or N1 < _M or N0 < _M:
        return False
    n_centers = -(-N0 // _M)
    n_groups = -(-n_centers // _TC)
    np_rows = 8 + _STRIDE * n_groups + 7
    bytes_needed = (
        3 * np_rows * N1 * N2 * 4  # xp, bp, out
        + 70 * _TC * N1 * N2 * 4  # live slab temporaries
        + 8 * _W * N1 * N2 * 4  # window values
    )
    return bytes_needed < int(VMEM_LIMIT * 0.85)


def _streaming_tc(shape) -> int:
    """Largest center-rows-per-group whose slab temporaries + windows
    fit the VMEM budget (0 = streaming unsupported)."""
    N0, N1, N2 = shape
    rowbytes = N1 * N2 * 4
    budget = int(VMEM_LIMIT * 0.8)
    # temporaries: _SLAB_TEMPS slabs of (tc, N1, N2); windows: xw + bw
    # (2 * (5 tc + 6) rows) + snw (5 tc rows)
    tc = (budget // rowbytes - 12) // (_SLAB_TEMPS + 15)
    return max(0, min(_TC, int(tc)))


def patch_sweep_streaming_supported(shape) -> bool:
    """Can the HBM-streaming kernel serve this grid?  Needs only the
    lane/extent basics plus ONE group window in VMEM — sizes far past
    the resident kernel's ceiling (256^3+).

    N1 must be a multiple of 8: the manual HBM<->VMEM window DMAs
    FAULT the TPU at runtime when the sublane extent is not — isolated
    on-chip 2026-08-21 (examples/probe_streamed_dma5.py: a trivial
    read+1/write kernel crashes the worker at N1=10 while the full
    sweep body is bit-exact vs the resident kernel at N1=16).  The
    resident kernel (BlockSpec-pipelined, no manual DMA) has no such
    constraint; odd-extent grids fall back to it or to the lax path."""
    if len(shape) != 3:
        return False
    N0, N1, N2 = shape
    if N2 % 128 or N1 % 8 or N1 < _M or N0 < _M:
        return False
    return _streaming_tc(shape) >= 1


def fused_patch_sweep_sqfd_streamed(
    x,
    b,
    kappa2,
    hinv2,
    seed,
    step,
    interpret: bool = False,
    with_noise: bool = True,
):
    """Streaming variant of :func:`fused_patch_sweep_sqfd`: x (and b)
    stay in HBM; each (colour, row-group) window is DMA'd into VMEM,
    updated, and written back (output aliased to the x input, grid
    sequential).  Deterministically identical to the resident kernel
    and the lax path for ANY group size (row groups of a colour are
    independent); the noise stream differs from the resident kernel's
    (group indexing enters the keying) but targets the same law."""
    N0, N1, N2 = x.shape
    assert patch_sweep_streaming_supported(x.shape), (
        x.shape,
        "streaming patch sweep: needs N1 % 8 == 0 (unaligned sublane "
        "window DMAs fault the TPU — probe_streamed_dma5) and an "
        "in-VMEM-budget group window",
    )
    tc = _streaming_tc(x.shape)
    stride = _M * tc
    n_centers = -(-N0 // _M)
    n_groups = -(-n_centers // tc)
    pad_lo = 8
    np_rows = pad_lo + stride * n_groups + 7
    pads = ((pad_lo, np_rows - pad_lo - N0), (0, 0), (0, 0))
    xp = jnp.pad(x, pads)
    with_b = b is not None

    fscal = jnp.stack(
        [jnp.asarray(kappa2, jnp.float32), jnp.asarray(hinv2, jnp.float32)]
    )
    iscal = jnp.stack(
        [jnp.asarray(seed, jnp.int32), jnp.asarray(step, jnp.int32)]
    )
    kern = functools.partial(
        _kernel_streamed,
        shape=(N0, N1, N2),
        pad_lo=pad_lo,
        n_groups=n_groups,
        tc=tc,
        with_noise=with_noise,
        with_b=with_b,
    )
    W = stride + 6
    win = pltpu.VMEM((W, N1, N2), jnp.float32)
    scratch = [win] + ([win] if with_b else []) + [
        pltpu.VMEM((stride, N1, N2), jnp.float32),
        pltpu.SemaphoreType.DMA((3,)),
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [fscal, iscal, xp]
    if with_b:
        bp = jnp.pad(b, pads)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(bp)
    out = pl.pallas_call(
        kern,
        grid=((_M**3) * n_groups,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((np_rows, N1, N2), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_compiler_params(
            dimension_semantics=("arbitrary",)
        ),
    )(*args)
    return out[pad_lo : pad_lo + N0]


def fused_patch_sweep_sqfd(
    x,
    b,
    kappa2,
    hinv2,
    seed,
    step,
    interpret: bool = False,
    with_noise: bool = True,
):
    """One full coloured vertex-star patch-Gibbs sweep of the SQUARED
    link-count FD operator (kappa2 + hinv2*links)^2 — one kernel
    launch, state resident in VMEM when it fits, HBM-streaming
    windows beyond (round 4).  See module docstring."""
    N0, N1, N2 = x.shape
    if not patch_sweep_supported(x.shape):
        return fused_patch_sweep_sqfd_streamed(
            x, b, kappa2, hinv2, seed, step,
            interpret=interpret, with_noise=with_noise,
        )
    if b is None:
        b = jnp.zeros_like(x)
    n_centers = -(-N0 // _M)
    n_groups = -(-n_centers // _TC)
    pad_lo = 8
    np_rows = pad_lo + _STRIDE * n_groups + 7
    pads = ((pad_lo, np_rows - pad_lo - N0), (0, 0), (0, 0))
    xp = jnp.pad(x, pads)
    bp = jnp.pad(b, pads)

    fscal = jnp.stack(
        [jnp.asarray(kappa2, jnp.float32), jnp.asarray(hinv2, jnp.float32)]
    )
    iscal = jnp.stack(
        [jnp.asarray(seed, jnp.int32), jnp.asarray(step, jnp.int32)]
    )
    kern = functools.partial(
        _kernel,
        shape=(N0, N1, N2),
        pad_lo=pad_lo,
        n_groups=n_groups,
        with_noise=with_noise,
    )
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_rows, N1, N2), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(fscal, iscal, xp, bp)
    return out[pad_lo : pad_lo + N0]
