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

__all__ = ["fused_patch_sweep_sqfd", "patch_sweep_supported"]

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
_TC = 8  # center rows per group
_STRIDE = _M * _TC  # 40 rows of centers per group
_W = _STRIDE + 6  # window rows: members (+-1) + stencil reach (+-2)


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


def _kernel(
    fscal_ref,  # SMEM (2,) f32: kappa2, hinv2
    iscal_ref,  # SMEM (2,) i32: seed, step
    xp_ref,  # (NP, N1, N2) padded x
    bp_ref,  # (NP, N1, N2) padded b
    out_ref,  # (NP, N1, N2)
    *,
    shape,  # true (N0, N1, N2)
    pad_lo,  # leading rows of padding
    n_groups,
    with_noise,
):
    N0, N1, N2 = shape
    k2 = fscal_ref[0]
    h2 = fscal_ref[1]
    if with_noise:
        su = iscal_ref[0].astype(jnp.uint32)
        stepu = iscal_ref[1].astype(jnp.uint32)
    f32 = jnp.float32

    out_ref[...] = xp_ref[...]

    j1 = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 1)
    uarange = jax.lax.broadcasted_iota(jnp.int32, (_W, 1, 1), 0)

    def body(i, _):
        c = i // n_groups
        g = i % n_groups
        a0 = c // (_M * _M)
        a1 = (c // _M) % _M
        a2 = c % _M

        # window start in padded coords: rows [w0, w0+_W) cover centers
        # a0 + 40g + 5t (t < 8) with member (+-1) and stencil (+-2) reach
        w0 = pad_lo + a0 + _STRIDE * g - 3
        xw = out_ref[pl.dslice(w0, _W)]
        bw = bp_ref[pl.dslice(w0, _W)]

        # global row of window index u
        gr = (a0 + _STRIDE * g - 3) + uarange  # (_W,1,1)
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
        crow = (a0 + _STRIDE * g) + _M * jax.lax.broadcasted_iota(
            jnp.int32, (_TC, 1, 1), 0
        )
        cvalid = (crow <= N0 - 1).astype(f32)  # crow >= 0 always
        center_m = cvalid * mplane[None]

        def sel(v, o):
            """(TC, N1, N2): value of window-array v at member offset o
            from each center (static stride-5 row select by reshape)."""
            s = v[1 + o[0] : 1 + o[0] + _STRIDE]
            s = s.reshape(_TC, _M, N1, N2)[:, 2]
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
                    _mix(h, jnp.uint32(p_)), N1, N2
                )
                ets += [e1, e2]
            ets = ets[:_K]
        else:
            ets = [jnp.zeros((_TC, N1, N2), f32)] * _K

        y = [None] * _K
        for i_ in reversed(range(_K)):
            s = z[i_] + ets[i_]
            for j_ in range(i_ + 1, _K):
                s = s - Lf[j_][i_] * y[j_]
            y[i_] = s / Lf[i_][i_]

        # scatter back: rebuild the 40-row member slab with masked
        # member updates (same-colour patches never collide)
        S = xw[1 : 1 + _STRIDE].reshape(_TC, _M, N1, N2)
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
        ).reshape(_STRIDE, N1, N2)
        out_ref[pl.dslice(w0 + 1, _STRIDE)] = Sn
        return 0

    jax.lax.fori_loop(0, (_M**3) * n_groups, body, 0)


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
    launch, state resident in VMEM.  See module docstring."""
    N0, N1, N2 = x.shape
    assert patch_sweep_supported(x.shape), x.shape
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
