"""Probe: mesh multicolour SOR sweep layouts for vmapped chains (round 4).

Question (VERDICT r03 item 1): is the 256-chain mesh sweep bound by the
vmapped gather layout (batch-leading (C, n) state => per-chain scalar
gathers) or by launch overhead?  Times, on the real TPU:

  A. current: jax.vmap over leading chain axis, op.sor_sweep per chain
  B. chain-major (n, C) state, one flat gather X[cols] -> (rows, w, C)
  C. chain-major (n, C) state, per-k row gathers sum_k vals[:,k,None]*X[cols[:,k]]
  D. offdiag_apply (matvec) in both layouts

Each variant runs K sweeps inside one jit via lax.scan so per-dispatch
tunnel overhead (~2.5 ms) amortizes; the in-loop kernel launches remain,
which is exactly what a V-cycle pays.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from parmgmc_tpu.models.matern import MaternMeshSampler

C = int(os.environ.get("PROBE_CHAINS", "256"))
K = int(os.environ.get("PROBE_SWEEPS", "50"))
REFINE = int(os.environ.get("PROBE_REFINE", "3"))


def force(v):
    return float(jnp.sum(v))


def time_fn(fn, *args, reps=3):
    out = fn(*args)
    force(out if isinstance(out, jax.Array) else out[0])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out if isinstance(out, jax.Array) else out[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ms = MaternMeshSampler(
        mesh_file="/root/reference/data/wrench.msh",
        kappa=5.0,
        refinements=REFINE,
        dtype=jnp.float32,
        coarsest_size=128,
    )
    op = ms.op
    n = op.n
    w = op.vals.shape[1]
    print(f"n={n} w={w} ncolors={op.ncolors} chains={C} sweeps={K}")

    omega = jnp.float32(1.0)
    b_cn = jnp.zeros((C, n), jnp.float32)
    b_nc = jnp.zeros((n, C), jnp.float32)
    X_cn = jnp.ones((C, n), jnp.float32)
    X_nc = jnp.ones((n, C), jnp.float32)

    # --- A: current vmapped sweep -----------------------------------------
    def sweeps_vmap(X):
        def body(Xc, _):
            Xc = jax.vmap(lambda x, bb: op.sor_sweep(bb, x, omega))(Xc, b_cn)
            return Xc, None
        X, _ = jax.lax.scan(body, X, None, length=K)
        return X

    # --- B: chain-major flat gather ---------------------------------------
    def sweep_cm_flat(X, b):
        for c in range(op.ncolors):
            s, e = op.color_starts[c], op.color_starts[c + 1]
            if s == e:
                continue
            g = X[op.cols[s:e]]                      # (rows, w, C)
            sums = jnp.einsum("rw,rwc->rc", op.vals[s:e], g)
            upd = (1.0 - omega) * X[s:e] + (omega / op.diag[s:e])[:, None] * (
                b[s:e] - sums
            )
            X = jax.lax.dynamic_update_slice(X, upd, (s, 0))
        return X

    def sweeps_cm_flat(X):
        def body(Xc, _):
            return sweep_cm_flat(Xc, b_nc), None
        X, _ = jax.lax.scan(body, X, None, length=K)
        return X

    # --- C: chain-major per-k gathers -------------------------------------
    def sweep_cm_perk(X, b):
        for c in range(op.ncolors):
            s, e = op.color_starts[c], op.color_starts[c + 1]
            if s == e:
                continue
            sums = jnp.zeros((e - s, C), jnp.float32)
            for k in range(w):
                sums = sums + op.vals[s:e, k][:, None] * X[op.cols[s:e, k]]
            upd = (1.0 - omega) * X[s:e] + (omega / op.diag[s:e])[:, None] * (
                b[s:e] - sums
            )
            X = jax.lax.dynamic_update_slice(X, upd, (s, 0))
        return X

    def sweeps_cm_perk(X):
        def body(Xc, _):
            return sweep_cm_perk(Xc, b_nc), None
        X, _ = jax.lax.scan(body, X, None, length=K)
        return X

    # --- D: matvecs --------------------------------------------------------
    def mv_vmap(X):
        def body(Xc, _):
            Xc = jax.vmap(op.apply)(Xc) * 1e-3
            return Xc, None
        X, _ = jax.lax.scan(body, X, None, length=K)
        return X

    def mv_cm(X):
        def body(Xc, _):
            g = Xc[op.cols]
            Xc = (op.diag[:, None] * Xc
                  + jnp.einsum("rw,rwc->rc", op.vals, g)) * 1e-3
            return Xc, None
        X, _ = jax.lax.scan(body, X, None, length=K)
        return X

    # --- F: degree-sorted rows within colour + per-k prefix gathers --------
    vals_np = np.asarray(op.vals)
    cols_np = np.asarray(op.cols)
    diag_np = np.asarray(op.diag)
    deg = (vals_np != 0).sum(1)
    order = np.concatenate([
        op.color_starts[c]
        + np.argsort(-deg[op.color_starts[c]:op.color_starts[c + 1]],
                     kind="stable")
        for c in range(op.ncolors)
    ])
    relabel = np.empty(n, np.int32)
    relabel[order] = np.arange(n, dtype=np.int32)
    vals_s = jnp.asarray(vals_np[order])
    cols_s = jnp.asarray(relabel[cols_np[order]])
    diag_s = jnp.asarray(diag_np[order])
    deg_s = deg[order]
    counts = []  # counts[c][k] = rows in colour c with degree > k, 8-rounded
    for c in range(op.ncolors):
        s, e = op.color_starts[c], op.color_starts[c + 1]
        dc = deg_s[s:e]
        wc = int(dc.max()) if e > s else 0
        counts.append(tuple(
            int(min(e - s, -(-int((dc > k).sum()) // 8) * 8))
            for k in range(wc)
        ))

    def sweep_prefix(X, b):
        for c in range(op.ncolors):
            s, e = op.color_starts[c], op.color_starts[c + 1]
            if s == e:
                continue
            acc = b[s:e]
            for k, cnt in enumerate(counts[c]):
                if cnt == 0:
                    break
                contrib = vals_s[s:s + cnt, k][:, None] * X[cols_s[s:s + cnt, k]]
                acc = acc.at[:cnt].add(-contrib)
            upd = (1.0 - omega) * X[s:e] + (omega / diag_s[s:e])[:, None] * acc
            X = jax.lax.dynamic_update_slice(X, upd, (s, 0))
        return X

    def sweeps_prefix(X):
        def body(Xc, _):
            return sweep_prefix(Xc, b_nc), None
        X, _ = jax.lax.scan(body, X, None, length=K)
        return X

    variants = [
        ("F sweep prefix chain-major", jax.jit(sweeps_prefix), X_nc),
        ("A sweep vmap (C,n)", jax.jit(sweeps_vmap), X_cn),
        ("B sweep chain-major flat", jax.jit(sweeps_cm_flat), X_nc),
        ("C sweep chain-major per-k", jax.jit(sweeps_cm_perk), X_nc),
        ("D matvec vmap", jax.jit(mv_vmap), X_cn),
        ("E matvec chain-major", jax.jit(mv_cm), X_nc),
    ]
    gather_bytes = n * w * C * 4
    for name, fn, X in variants:
        t = time_fn(fn, X) / K
        print(f"{name:28s} {t * 1e3:8.3f} ms/sweep  "
              f"({gather_bytes / t / 1e9:6.1f} GB/s gather-equiv)")


if __name__ == "__main__":
    main()
