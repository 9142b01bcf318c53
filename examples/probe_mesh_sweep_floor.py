"""Where do the unstructured sweep's 2.67 ms/sweep go?  (VERDICT r4 #7)

The chain-major multicolour SOR sweep on the wrench runs ~2x above its
nnz-bytes HBM floor.  Candidate explanations: (i) the per-k prefix
accumulator chain (`acc.at[:cnt].add`) re-reads/re-writes the colour
block once per ELL column — up to 2*nnz*C extra accumulator bytes if
XLA does not fuse the chain; (ii) gather issue rate on 1 KB rows.

Stages (wrench refine-3, C chains, f32, 32-iteration jitted scans):

  copy      : contiguous read+write of the gather byte volume — the
              machine floor for any sweep implementation
  offdiag   : op.offdiag_apply in a scan (per-k prefix path)
  sweep     : op.sor_sweep (the production path, benchmark_matern)
  padsum    : per-k contributions padded to the colour block and summed
              in one expression (no read-modify-write chain)
  segment   : row-segmented dense-width gathers — rows grouped into
              runs whose width is the run's max degree (degree-sorted
              rows make runs near-tight); ONE gather + ONE reduction
              per (colour, segment), no accumulator chain
  segsweep  : full SOR sweep built on the segment layout

Run on the TPU:
  python examples/probe_mesh_sweep_floor.py [C] [refine] [mesh]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 32


def force(v):
    return float(jnp.sum(v))


def timed(fn, *args):
    out = fn(*args)
    force(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        force(fn(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def segments_of(op, max_pad=0.08):
    """Static (start, end, width) runs per colour: rows are degree-sorted
    so a greedy scan keeps dense-width padding under ``max_pad``."""
    segs = []
    for c in range(op.ncolors):
        s, e = op.color_starts[c], op.color_starts[c + 1]
        counts = op.color_counts[c]
        if e == s:
            segs.append(())
            continue
        # per-row degree from the prefix counts (cnt_k = #rows with >k nbrs)
        deg = np.zeros(e - s, np.int64)
        for k, cnt in enumerate(counts):
            deg[:cnt] += 1
        runs = []
        r0 = 0
        while r0 < e - s:
            w0 = int(deg[r0]) if deg[r0] > 0 else 1
            r1 = r0 + 8
            # extend while padding stays bounded (rows are sorted desc)
            while r1 < e - s:
                nxt = min(e - s, r1 + 8)
                pad = w0 * (nxt - r0) - int(deg[r0:nxt].sum())
                if pad > max_pad * w0 * (nxt - r0):
                    break
                r1 = nxt
            r1 = min(r1, e - s)
            runs.append((s + r0, s + r1, w0))
            r0 = r1
        segs.append(tuple(runs))
    return tuple(segs)


def offdiag_segment(op, segs, x):
    outs = []
    for c in range(op.ncolors):
        s, e = op.color_starts[c], op.color_starts[c + 1]
        if e == s:
            continue
        parts = []
        for r0, r1, w in segs[c]:
            g = x[op.cols[r0:r1, :w]]  # (rows, w, C)
            parts.append(jnp.sum(op.vals[r0:r1, :w, None] * g, axis=1))
        outs.append(jnp.concatenate(parts, axis=0))
    return jnp.concatenate(outs, axis=0)


def sor_sweep_segment(op, segs, b, x, omega):
    for c in range(op.ncolors):
        s, e = op.color_starts[c], op.color_starts[c + 1]
        if e == s:
            continue
        parts = []
        for r0, r1, w in segs[c]:
            g = x[op.cols[r0:r1, :w]]
            parts.append(jnp.sum(op.vals[r0:r1, :w, None] * g, axis=1))
        acc = b[s:e] - jnp.concatenate(parts, axis=0)
        upd = (1.0 - omega) * x[s:e] + (omega / op.diag[s:e])[:, None] * acc
        x = jax.lax.dynamic_update_slice(x, upd, (s, 0))
    return x


def sor_sweep_padsum(op, b, x, omega):
    for c in range(op.ncolors):
        s, e = op.color_starts[c], op.color_starts[c + 1]
        if e == s:
            continue
        tot = None
        for k, cnt in enumerate(op.color_counts[c]):
            if cnt == 0:
                break
            contrib = op.vals[s : s + cnt, k, None] * x[op.cols[s : s + cnt, k]]
            if cnt < e - s:
                contrib = jnp.pad(contrib, ((0, e - s - cnt), (0, 0)))
            tot = contrib if tot is None else tot + contrib
        acc = b[s:e] - tot
        upd = (1.0 - omega) * x[s:e] + (omega / op.diag[s:e])[:, None] * acc
        x = jax.lax.dynamic_update_slice(x, upd, (s, 0))
    return x


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    refine = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mesh = sys.argv[3] if len(sys.argv) > 3 else "wrench"
    from parmgmc_tpu.models.matern import MaternMeshSampler

    ms = MaternMeshSampler(
        mesh_file=mesh, kappa=50.0, refinements=refine, dtype=jnp.float32
    )
    op = ms.op
    n = op.n
    nnz = int(sum(sum(c) for c in op.color_counts))
    segs = segments_of(op)
    seg_bytes = sum(
        (r1 - r0) * w for runs in segs for (r0, r1, w) in runs
    )
    nseg = sum(len(runs) for runs in segs)
    print(
        f"{mesh} refine-{refine}: n={n}, nnz(padded8)={nnz}, C={C}, "
        f"ncolors={op.ncolors}; segments: {nseg} runs, "
        f"{seg_bytes / max(nnz, 1):.3f}x nnz gather volume",
        flush=True,
    )

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (n, C), jnp.float32)
    b = jnp.zeros((n, C), jnp.float32)
    om = jnp.float32(1.0)

    # contiguous copy floor of the gather volume
    blob = jnp.zeros((max(nnz, n), C), jnp.float32)

    @jax.jit
    def run_copy(a):
        def body(c, _):
            return c * 0.999, 0.0

        a, _ = jax.lax.scan(body, a, None, length=ITERS)
        return a

    dt_copy = timed(run_copy, blob)

    def scan_of(f):
        @jax.jit
        def run(x):
            def body(c, _):
                return f(c) * 0.05, 0.0

            x, _ = jax.lax.scan(body, x, None, length=ITERS)
            return x

        return run

    import os

    want = os.environ.get(
        "PROBE_STAGES", "offdiag,sweep,padsum,segoff,segsweep"
    ).split(",")
    gb = nnz * C * 4 / 1e9
    print(f"{ITERS}-iter scans, nnz gather volume {gb * 1e3:.1f} MB:")
    print(f"  {'copy(r+w)':12s} {dt_copy * 1e3:8.3f} ms/iter  "
          f"({gb / dt_copy:6.1f} GB/s of nnz)", flush=True)

    stages = {
        "offdiag": lambda x: op.offdiag_apply(x),
        "sweep": lambda x: op.sor_sweep(b, x, om),
        "padsum": lambda x: sor_sweep_padsum(op, b, x, om),
        "segoff": lambda x: offdiag_segment(op, segs, x),
        "segsweep": lambda x: sor_sweep_segment(op, segs, b, x, om),
    }
    for name in want:
        dt = timed(scan_of(stages[name]), x0)
        print(f"  {name:12s} {dt * 1e3:8.3f} ms/iter  "
              f"({gb / dt:6.1f} GB/s of nnz)", flush=True)

    if "segsweep" in want or "padsum" in want:
        # exactness of the variants vs the production sweep
        ref = op.sor_sweep(b, x0, om)
        if "padsum" in want:
            d1 = float(jnp.abs(ref - sor_sweep_padsum(op, b, x0, om)).max())
            print(f"  padsum vs sweep max |dx| = {d1:.2e}")
        if "segsweep" in want:
            d2 = float(
                jnp.abs(ref - sor_sweep_segment(op, segs, b, x0, om)).max()
            )
            print(f"  segment vs sweep max |dx| = {d2:.2e}")


if __name__ == "__main__":
    main()
