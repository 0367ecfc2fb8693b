"""Cross-face cube topology: which face/edge meets which across the seams.

The rHEALPix cube has 12 undirected seams (24 directed (face, edge) pairs).
A queen neighborhood that stops at the face boundary under-counts seam
cells (VERDICT r5 "What's missing" #3 — the interior-adjacency caveat on
the spatial-stats layer); this module derives the exact seam topology so
the lattice operators can close the neighborhoods.

``edge_table(cfg)`` returns, for every (face, edge) of the unfolded cube,
the (face2, edge2, flip) it is glued to on the SPHERE: a cell at position
``t`` along (face, edge) touches cells around position ``t2 = flip ?
E-1-t : t`` along (face2, edge2), where positions run col-wise on
horizontal edges (0=top, 2=bottom) and row-wise on vertical ones
(1=right, 3=left), and E = n_side**res.

The table is DERIVED from the projection kernel rather than hardcoded:
for each edge sample position, step an epsilon across the edge on the
sphere (extrapolating lon/lat through two interior probes — every cube
edge sits at benign latitudes, the poles are face CENTERS, so the
extrapolation is regular; lon deltas are wrapped for the antimeridian),
re-encode the outside point, and fit the unique (face2, edge2, flip)
consistent with every sample.  The fit asserts exhaustively (all E
samples, one face, one edge shape, exact identity or reversal) and the
result is verified symmetric — (face2, edge2) must map back to
(face, edge) with the same flip — so a derivation bug cannot produce a
silently-wrong table.  Config-dependent (north_square / south_square
choose which equatorial squares the caps unfold onto); results are
cached per config.

Reference parity: the reference delegates cell topology to the
`rhealpixdggs` library (Cell.neighbors) and never exposes cross-face
neighborhoods in its raster ops; this closes that gap for the
spatial-stats layer.
"""

from __future__ import annotations

import numpy as np

from . import projection
from .cells import HALF_SIDE, _face_ul, planar_to_face_rowcol
from .config import DEFAULT_CONFIG, RHEALPixConfig

#: outward planar normal per edge index (0=top, 1=right, 2=bottom, 3=left)
_NORMALS = {0: (0.0, 1.0), 1: (1.0, 0.0), 2: (0.0, -1.0), 3: (-1.0, 0.0)}

_CACHE: dict[tuple[int, int, int], dict] = {}


def edge_table(cfg: RHEALPixConfig = DEFAULT_CONFIG,
               derive_res: int = 2) -> dict:
    """{(face, edge): (face2, edge2, flip)} for all 24 directed seams."""
    key = (cfg.n_side, cfg.north_square, cfg.south_square)
    if key in _CACHE:
        return _CACHE[key]
    E = cfg.n_side ** derive_res
    w = HALF_SIDE / E
    uls = _face_ul(cfg)
    table: dict = {}
    for face in range(6):
        ulx, uly = uls[face]
        for edge in range(4):
            hits = []
            for t in range(E):
                if edge == 0:
                    ex, ey = ulx + (t + 0.5) * w, uly
                elif edge == 2:
                    ex, ey = ulx + (t + 0.5) * w, uly - E * w
                elif edge == 1:
                    ex, ey = ulx + E * w, uly - (t + 0.5) * w
                else:
                    ex, ey = ulx, uly - (t + 0.5) * w
                nx, ny = _NORMALS[edge]
                eps = w * 1e-3
                # two interior probes -> extrapolate one eps past the edge
                # on the sphere (inverse is continuous across the seam
                # there, unlike in the unfolded plane)
                lons, lats = projection.inverse(
                    np.array([ex - 2 * eps * nx, ex - eps * nx]),
                    np.array([ey - 2 * eps * ny, ey - eps * ny]),
                    cfg.north_square, cfg.south_square)
                dlon = (lons[1] - lons[0] + 180.0) % 360.0 - 180.0
                dlat = lats[1] - lats[0]
                x, y = projection.forward(
                    np.array([lons[1] + 2.0 * dlon]),
                    np.array([lats[1] + 2.0 * dlat]),
                    cfg.north_square, cfg.south_square)
                f2, r2, c2 = planar_to_face_rowcol(x, y, derive_res, cfg)
                hits.append((int(f2[0]), int(r2[0]), int(c2[0])))
            faces2 = {h[0] for h in hits}
            if len(faces2) != 1 or face in faces2 or min(faces2) < 0:
                raise AssertionError(f"seam derivation: ({face},{edge}) "
                                     f"-> inconsistent faces {faces2}")
            face2 = faces2.pop()
            rows = [h[1] for h in hits]
            cols = [h[2] for h in hits]
            if all(r == 0 for r in rows):
                edge2, ts = 0, cols
            elif all(r == E - 1 for r in rows):
                edge2, ts = 2, cols
            elif all(c == E - 1 for c in cols):
                edge2, ts = 1, rows
            elif all(c == 0 for c in cols):
                edge2, ts = 3, rows
            else:
                raise AssertionError(f"seam derivation: ({face},{edge}) "
                                     f"-> no single target edge: {hits}")
            if ts == list(range(E)):
                flip = 0
            elif ts == list(range(E - 1, -1, -1)):
                flip = 1
            else:
                raise AssertionError(f"seam derivation: ({face},{edge}) "
                                     f"-> non-isometric positions {ts}")
            table[(face, edge)] = (face2, edge2, flip)
    # gluing is an involution on directed edges: a non-symmetric table
    # means the derivation disagrees with itself — refuse to return it
    for (f, e), (f2, e2, flip) in table.items():
        if table[(f2, e2)] != (f, e, flip):
            raise AssertionError(f"seam table not symmetric at ({f},{e})")
    _CACHE[key] = table
    return table


def edge_table_rows(cfg: RHEALPixConfig = DEFAULT_CONFIG) -> list:
    """The table as sorted (face, edge, face2, edge2, flip) tuples — the
    literal relation the Spark/DuckDB lattice operators broadcast-join."""
    return [(f, e, *v) for (f, e), v in sorted(edge_table(cfg).items())]
