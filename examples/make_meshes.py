"""Generate the repo's own mesh assets (data/*.msh).

The reference ships CAD-derived Gmsh meshes (``/root/reference/data/
{wrench,lshape,piece,cuboid_hole}.msh``); this repo generates equivalent
*classes* of geometry from implicit regions (masked Kuhn-subdivided
grids + deterministic jitter, models.mesh.masked_grid_mesh) so the mesh
half of the test suite and all benchmark presets work with no reference
mount.  Node/cell counts are tuned to the same order of magnitude as
the reference assets:

    wrench       3D   219 nodes /   492 tets   (ref: 171 / 356)
    lshape       2D   455 nodes /   794 tris   (ref: 408 / 734)
    piece        3D  4148 nodes / 18156 tets   (ref: 4177 / 14127)
    cuboid_hole  3D   202 nodes /   550 tets   (ref: 104 / 255)

Run:  python examples/make_meshes.py  [--outdir data]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from parmgmc_tpu.models.mesh import (
    assemble_p1,
    masked_grid_mesh,
    write_gmsh,
)


def wrench():
    """3D wrench-ish solid: a handle bar joining two heads with holes —
    open-end head at y=0, ring head at y=16."""

    def inside(p):
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        handle = (np.abs(x) < 1.3) & (y > 1.0) & (y < 15.0) & (np.abs(z) < 1.0)
        head1 = (x**2 + y**2 < 2.9**2) & (np.abs(z) < 1.0)
        jaw = (np.abs(x) < 0.9) & (y < -0.4)  # open jaw slot
        head1 &= ~jaw
        head2 = (x**2 + (y - 16.0) ** 2 < 2.5**2) & (np.abs(z) < 1.0)
        hole2 = x**2 + (y - 16.0) ** 2 < 1.1**2
        head2 &= ~hole2
        return handle | head1 | head2

    return masked_grid_mesh(
        [[-3.2, 3.2], [-3.2, 18.8], [-1.1, 1.1]], 1.45, inside, jitter=0.12
    )


def lshape():
    """2D L-shaped domain: [0,2]^2 minus the open top-right quadrant."""

    def inside(p):
        x, y = p[:, 0], p[:, 1]
        return (x < 2.0) & (y < 2.0) & ~((x > 1.0) & (y > 1.0))

    return masked_grid_mesh([[0, 2], [0, 2]], 2.0 / 23, inside, jitter=0.18)


def piece():
    """3D machined plate: [0,4]x[0,2]x[0,0.6] minus two bores and a
    corner chamfer."""

    def inside(p):
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        plate = (x < 4.0) & (y < 2.0) & (z < 0.6)
        bore1 = (x - 1.0) ** 2 + (y - 1.0) ** 2 < 0.45**2
        bore2 = (x - 3.0) ** 2 + (y - 1.0) ** 2 < 0.45**2
        chamfer = x + y > 5.2
        return plate & ~bore1 & ~bore2 & ~chamfer

    return masked_grid_mesh(
        [[0, 4], [0, 2], [0, 0.6]], 0.115, inside, jitter=0.1
    )


def cuboid_hole():
    """3D unit cube minus a through-bore along z."""

    def inside(p):
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        return (
            (x < 1.0) & (y < 1.0) & (z < 1.0)
            & ((x - 0.5) ** 2 + (y - 0.5) ** 2 > 0.28**2)
        )

    return masked_grid_mesh([[0, 1], [0, 1], [0, 1]], 0.21, inside, jitter=0.1)


GEOMETRIES = {
    "wrench": wrench,
    "lshape": lshape,
    "piece": piece,
    "cuboid_hole": cuboid_hole,
}


def main():
    ap = argparse.ArgumentParser()
    default_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
    )
    ap.add_argument("--outdir", default=default_out)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    for name, fn in GEOMETRIES.items():
        pts, cells = fn()
        # sanity: connected-ish, assemblable, SPD-able mesh
        K, M = assemble_p1(pts, cells)
        lumped = np.asarray(M.sum(axis=1)).ravel()
        assert (lumped > 0).all(), f"{name}: degenerate mass row"
        path = os.path.join(args.outdir, f"{name}.msh")
        write_gmsh(path, pts, cells)
        print(
            f"{name:12s} {pts.shape[0]:6d} nodes  {cells.shape[0]:6d} "
            f"{'tris' if cells.shape[1] == 3 else 'tets'}  -> {path}"
        )


if __name__ == "__main__":
    main()
