"""Why does a k-window B^T read cost 0.7 ms in a scan body? (r5)

The posterior tax at 256^3 is launch/overhead-bound, not byte-bound:
profile_cycle --posterior measured btx = 0.697 ms/step for reading
5 windows of 62^3 floats (4.7 MB -> 13 us of bandwidth).  Theories:

  T1 fixed cost per loop-body kernel (~0.7 ms, CLAUDE.md) — then a
     body with TWO btx reads costs ~1.4 ms;
  T2 the TRACED window starts (patch_starts ride the pytree as array
     leaves) force dynamic-slice ops that cannot fuse — then baking
     the starts as STATIC ints collapses the cost.

Stages (256^3 array, k=5 windows of 62^3, 256-step scans):

  btx_traced   bt_apply-style window reads, traced starts
  btx_static   same, Python-int starts (static slices)
  btx_double   two traced reads per body
  upd_traced   window UPDATE chain (patch_apply_add-style), traced
  upd_static   same, static starts

Run on the TPU: python examples/probe_patch_overhead.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("PROBE_N", "256"))
K = 5
BOX = (62, 62, 62)
STEPS = 256


def force(v):
    return float(jnp.sum(v))


def timed(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: force(a) if hasattr(a, "shape") else a, out)
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda a: force(a) if hasattr(a, "shape") else a, out
        )
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best


def main():
    rng = np.random.default_rng(0)
    starts_np = rng.integers(0, N - BOX[0], size=(K, 3)).astype(np.int32)
    pv = jnp.asarray(rng.standard_normal((K, *BOX)), jnp.float32)
    x0 = jnp.zeros((N, N, N), jnp.float32)

    def bt(x, starts, static):
        outs = []
        for j in range(K):
            if static:
                sl = tuple(
                    slice(int(starts_np[j, a]), int(starts_np[j, a]) + BOX[a])
                    for a in range(3)
                )
                win = x[sl]
            else:
                win = jax.lax.dynamic_slice(x, tuple(starts[j]), BOX)
            outs.append(jnp.sum(pv[j] * win))
        return jnp.stack(outs)

    def upd(x, w, starts, static):
        for j in range(K):
            st = (
                tuple(int(s) for s in starts_np[j])
                if static
                else tuple(starts[j])
            )
            win = jax.lax.dynamic_slice(x, st, BOX)
            x = jax.lax.dynamic_update_slice(x, win + pv[j] * w[j], st)
        return x

    starts = jnp.asarray(starts_np)

    def scan_of(body):
        @jax.jit
        def run(x, st_):
            def f(c, _):
                return body(c, st_), 0.0

            c, _ = jax.lax.scan(f, x, None, length=STEPS)
            return c

        return run

    # serialization trick: fold the tiny result back through a window
    def btx_body(static):
        def body(x, st_):
            t = bt(x, st_, static)
            return upd(x, t * 1e-30, st_, static)

        return body

    def scan_of2(body):
        @jax.jit
        def run(x, y, st_):
            def f(c, _):
                return body(c[0], c[1], st_), 0.0

            c, _ = jax.lax.scan(f, (x, y), None, length=STEPS)
            return c

        return run

    def btx2_body(static):
        def body(x, y, st_):
            t = bt(x, st_, static)
            u = bt(y, st_, static)
            return (
                upd(x, t * 1e-30, st_, static),
                upd(y, u * 1e-30, st_, static),
            )

        return body

    rows = {}
    rows["btx_traced"] = timed(scan_of(btx_body(False)), x0, starts)
    rows["btx_static"] = timed(scan_of(btx_body(True)), x0, starts)
    rows["btx_double"] = timed(
        scan_of2(btx2_body(False)), x0, jnp.ones_like(x0), starts
    )

    print(f"{N}^3, k={K} windows {BOX}, {STEPS}-step scans:")
    for k, v in rows.items():
        print(f"  {k:12s} {v * 1e3:8.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
