"""Checkpointing and VTK output.

* Checkpoint/resume: the reference has none (chain state lives in the
  KSP solution vector between solves, SURVEY §5); here a chain state is
  the pair (x, key) and round-trips through a single npz file.
* VTK: legacy ASCII writers for structured grids (STRUCTURED_POINTS,
  the ex2/ex6-style sample/mean/var dumps) and unstructured simplex
  meshes (UNSTRUCTURED_GRID, the ParaView output of the MFEM benchmark
  backend, examples/benchmark/problem_mfem.hh:115-149).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from parmgmc_tpu.chain import ChainState

__all__ = [
    "save_chain_state",
    "load_chain_state",
    "write_vtk_structured",
    "write_vtk_unstructured",
]


def save_chain_state(path: str, state: ChainState) -> None:
    np.savez(
        path,
        x=np.asarray(state.x),
        key=np.asarray(state.key),
    )


def load_chain_state(path: str) -> ChainState:
    d = np.load(path if path.endswith(".npz") else path + ".npz")
    return ChainState(x=jnp.asarray(d["x"]), key=jnp.asarray(d["key"]))


def write_vtk_structured(path: str, fields: dict) -> None:
    """Legacy VTK STRUCTURED_POINTS file with point-data fields (2D/3D)."""
    shapes = {tuple(np.asarray(v).shape) for v in fields.values()}
    assert len(shapes) == 1, "all fields must share a grid shape"
    shape = shapes.pop()
    dims = tuple(shape) + (1,) * (3 - len(shape))
    n = int(np.prod(dims))
    sp = [1.0 / max(s - 1, 1) for s in dims]
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\nparmgmc_tpu field\nASCII\n")
        f.write("DATASET STRUCTURED_POINTS\n")
        f.write(f"DIMENSIONS {dims[0]} {dims[1]} {dims[2]}\n")
        f.write("ORIGIN 0 0 0\n")
        f.write(f"SPACING {sp[0]} {sp[1]} {sp[2]}\n")
        f.write(f"POINT_DATA {n}\n")
        for name, v in fields.items():
            arr = np.asarray(v).reshape(-1, order="F")
            f.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
            f.write("\n".join(f"{x:.10g}" for x in arr))
            f.write("\n")


def write_vtk_unstructured(path: str, points, cells, fields: dict) -> None:
    """Legacy VTK UNSTRUCTURED_GRID (tri=5, tet=10) with point data."""
    points = np.asarray(points)
    cells = np.asarray(cells)
    npts, d = points.shape
    k = cells.shape[1]
    ctype = 5 if k == 3 else 10
    pts3 = np.zeros((npts, 3))
    pts3[:, :d] = points
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\nparmgmc_tpu mesh\nASCII\n")
        f.write("DATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {npts} double\n")
        for p in pts3:
            f.write(f"{p[0]:.10g} {p[1]:.10g} {p[2]:.10g}\n")
        f.write(f"CELLS {len(cells)} {len(cells) * (k + 1)}\n")
        for c in cells:
            f.write(f"{k} " + " ".join(str(int(v)) for v in c) + "\n")
        f.write(f"CELL_TYPES {len(cells)}\n")
        f.write("\n".join([str(ctype)] * len(cells)))
        f.write(f"\nPOINT_DATA {npts}\n")
        for name, v in fields.items():
            arr = np.asarray(v).ravel()
            f.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
            f.write("\n".join(f"{x:.10g}" for x in arr))
            f.write("\n")
