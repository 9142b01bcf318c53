"""Vertex-star patch (block-)Gibbs sampler.

Rebuild of the reference's ASM star-patch smoother configuration —
firedrake's ``ASMStarPC`` with a ``cholsampler`` sub-sub-PC
(``/root/reference/examples/ex9.py:48-66``), the smoother of choice for
squared-operator priors where point-Gibbs mixes poorly.  Block-Gibbs:
patch S (a node and its star neighbours) is resampled from its exact
conditional

    x_S ~ N(A_SS^{-1} (b_S - A_{S,rest} x_rest), A_SS^{-1})

patch by patch.  TPU-native formulation: patches are coloured so that
same-colour patches are mutually uncoupled (per-axis residues mod
(radius+3)); one colour pass updates all its patches simultaneously.
The tiny (k,k) patch systems are handled STRUCTURE-OF-ARRAYS: the
patch matrix entries live as subgrid-shaped planes and the Cholesky
factorisation + triangular solves are unrolled over the static k, so
every op is a plain VPU elementwise op over the colour subgrid.  This
replaces the reference's per-patch LAPACK ``potrf``/``trsv`` fast path
(pc_chols.c:174-194) — and deliberately avoids ``(..., k, k)``-shaped
batched ``lax.linalg`` calls, whose tiny trailing dims pad to (8, 128)
TPU tiles (a measured 20.9x HBM expansion that OOMed 128^3 setups).

Each patch update is an exact Gibbs conditional, so the whole sweep
preserves N(A^{-1}b, A^{-1}) exactly — verified by the machine-precision
invariance tests.  Cost: (radius+3)^d colour passes per sweep, each
touching only its n/(radius+3)^d-point subgrid, so a full sweep is
O(k^3 n) elementwise work regardless of the colour count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parmgmc_tpu._pytree import pytree_dataclass
from parmgmc_tpu.operators.stencil import StencilOperator
from parmgmc_tpu.samplers.gibbs import _draw

__all__ = ["PatchGibbsSampler"]


def _shift(x, off, fill=0.0):
    """x[i + off] with constant fill, any radius."""
    r = max((abs(o) for o in off), default=0)
    if r == 0:
        return x
    xp = jnp.pad(x, r, constant_values=fill)
    sl = tuple(slice(r + o, r + o + s) for o, s in zip(off, x.shape))
    return xp[sl]


def _ingrid_mask(shape, off, dtype):
    """1 where node i+off exists."""
    m = np.ones(shape)
    for ax, o in enumerate(off):
        idx = [slice(None)] * len(shape)
        if o < 0:
            idx[ax] = slice(0, -o)
        elif o > 0:
            idx[ax] = slice(shape[ax] - o, shape[ax])
        else:
            continue
        m[tuple(idx)] = 0.0
    return jnp.asarray(m, dtype=dtype)


@pytree_dataclass(meta=("patch_offsets", "ncolor_base"))
class PatchGibbsSampler:
    """Coloured vertex-star block-Gibbs sweep for N(A^{-1}b, A^{-1})."""

    base: StencilOperator
    patch_offsets: tuple  # k member offsets (first = (0,...,0))
    ncolor_base: int  # colours = ncolor_base ** ndim

    @staticmethod
    def create(op: StencilOperator) -> "PatchGibbsSampler":
        assert isinstance(op, StencilOperator)
        d = op.ndim
        patch = [(0,) * d]
        for ax in range(d):
            for s in (-1, 1):
                off = [0] * d
                off[ax] = s
                patch.append(tuple(off))
        return PatchGibbsSampler(
            base=op, patch_offsets=tuple(patch), ncolor_base=op.radius + 3
        )

    # -- protocol ------------------------------------------------------------
    @property
    def grid_shape(self):
        return self.base.grid_shape

    @property
    def dtype(self):
        return self.base.dtype

    def noise_shapes(self):
        k = len(self.patch_offsets)
        return [{"eta": (k, *self.grid_shape)}]

    def _color_mask(self, c, shape):
        d = len(shape)
        m = self.ncolor_base
        code = jnp.zeros(shape, dtype=jnp.int32)
        for ax in range(d):
            code = code * m + (
                jax.lax.broadcasted_iota(jnp.int32, shape, ax) % m
            )
        return code == c

    def step_with_noise(self, x, b, noises):
        """One full coloured patch sweep (every node's patch resampled).

        Scales by colour-SUBGRID gathers: pass c touches only the
        (n/ncolors)-point strided subgrid of its patch centers — member
        values, neighbour contributions, matrix entries and noise are
        all gathered at stride ``ncolor_base`` — so a sweep costs
        O(k nnz n) total regardless of the colour count, where a masked
        full-grid formulation would cost O(ncolors nnz n) (125x waste
        for 3D radius-2 priors).  The sweep state lives in a zero-padded
        buffer: strided slices of out-of-grid patch members read finite
        zeros and the identity rows of dummy members keep their rhs at
        0.  The patch systems are factored on the fly with an unrolled
        elementwise Cholesky (see module docstring).
        """
        eta = noises[0]["eta"]  # (k, *grid)
        shape = self.grid_shape
        d = len(shape)
        k = len(self.patch_offsets)
        m = self.ncolor_base
        pad = m  # covers |o_j + o| <= radius + 1 <= m
        dtype = self.dtype
        coeff_map = dict(zip(self.base.offsets, self.base.coeffs))

        xp = jnp.pad(x, pad)
        bp = jnp.pad(b, pad)
        dgp = jnp.pad(self.base.diag, pad)
        cfp = {
            o: jnp.pad(jnp.broadcast_to(jnp.asarray(co, dtype), shape), pad)
            for o, co in coeff_map.items()
        }

        for c in range(m**d):
            # per-axis residues of colour c (matches _color_mask's code)
            a = []
            cc = c
            for _ in range(d):
                a.append(cc % m)
                cc //= m
            a = tuple(reversed(a))
            cnt = tuple(
                len(range(ai, n, m)) for ai, n in zip(a, shape)
            )

            def gsub(arr, off):
                """Gather arr (padded) at center-subgrid + off."""
                sl = tuple(
                    slice(pad + ai + oi, pad + ai + oi + (ci - 1) * m + 1, m)
                    for ai, oi, ci in zip(a, off, cnt)
                )
                return arr[sl]

            zero_off = (0,) * d
            # per-member in-grid masks on the subgrid (center + o_j)
            coords = [
                a[ax]
                + m * jax.lax.broadcasted_iota(jnp.int32, cnt, ax)
                for ax in range(d)
            ]
            masks = []
            for o in self.patch_offsets:
                ok = jnp.ones(cnt, dtype)
                for ax, oo in enumerate(o):
                    p_ax = coords[ax] + oo
                    ok = ok * (
                        (p_ax >= 0) & (p_ax <= shape[ax] - 1)
                    ).astype(dtype)
                masks.append(ok)

            # xs_j, (A x)_j, b_j at member positions (all strided gathers)
            xs, axs, bs = [], [], []
            for j, o in enumerate(self.patch_offsets):
                xs.append(gsub(xp, o))
                ax_j = gsub(dgp, o) * xs[-1]
                for oo, cf in cfp.items():
                    tot = tuple(q + w for q, w in zip(o, oo))
                    ax_j = ax_j + gsub(cf, o) * gsub(xp, tot)
                axs.append(ax_j)
                bs.append(gsub(bp, o))

            # A_SS entries on the subgrid, SoA: dummy (out-of-grid)
            # members get identity rows so every factor is SPD.
            def ass(j1, j2):
                o1, o2 = self.patch_offsets[j1], self.patch_offsets[j2]
                if j1 == j2:
                    return gsub(dgp, o1) * masks[j1] + (1.0 - masks[j1])
                rel = tuple(q - w for w, q in zip(o1, o2))
                if rel in cfp:
                    return gsub(cfp[rel], o1) * masks[j1] * masks[j2]
                return None  # structural zero

            # rhs_i = mask_i (b - A x)_i + (A_SS x_S)_i
            rhs = []
            for i in range(k):
                acc = masks[i] * (bs[i] - axs[i])
                for j in range(k):
                    e = ass(i, j) if j <= i else ass(j, i)
                    if e is not None:
                        acc = acc + e * xs[j]
                rhs.append(acc)

            # unrolled Cholesky-Banachiewicz over the static k (every op
            # a subgrid-shaped elementwise op; structural zeros still
            # participate below the diagonal because of fill-in)
            L = [[None] * k for _ in range(k)]
            for i in range(k):
                for j in range(i + 1):
                    s = ass(i, j)
                    s = jnp.zeros(cnt, dtype) if s is None else s
                    for t in range(j):
                        s = s - L[i][t] * L[j][t]
                    if i == j:
                        L[i][i] = jnp.sqrt(s)
                    else:
                        L[i][j] = s / L[j][j]

            # z = L^{-1} rhs; y = L^{-T}(z + eta)
            z = []
            for i in range(k):
                s = rhs[i]
                for j in range(i):
                    s = s - L[i][j] * z[j]
                z.append(s / L[i][i])
            etac = [gsub(jnp.pad(eta[j], pad), zero_off) for j in range(k)]
            y = [None] * k
            for i in reversed(range(k)):
                s = z[i] + etac[i]
                for j in range(i + 1, k):
                    s = s - L[j][i] * y[j]
                y[i] = s / L[i][i]

            # scatter members back into the padded state (same-colour
            # patches are >= 3 apart, so member positions never collide)
            for j, o in enumerate(self.patch_offsets):
                sl = tuple(
                    slice(pad + ai + oi, pad + ai + oi + (ci - 1) * m + 1, m)
                    for ai, oi, ci in zip(a, o, cnt)
                )
                upd = jnp.where(masks[j] > 0.5, y[j], xp[sl])
                xp = xp.at[sl].set(upd)

        return xp[tuple(slice(pad, pad + n) for n in shape)]

    def prepare(self, b):
        return None

    def step(self, key, x, b, aux=None):
        key, sub = jax.random.split(key)
        noises = _draw(sub, self.noise_shapes(), x.dtype)
        return key, self.step_with_noise(x, b, noises)
