"""Driver-side Delaunay triangulation (Bowyer-Watson).

The reference builds one Delaunay triangulation of the fill points and
shares it read-only across threads (raster-fill-nn/triangulation.rs:
29-59, spade crate); this is the engine's analogue: built once on the
driver for the (small) point table, then the (n, 3) triangle index
table rides the task closure into fill_barycentric — the broadcast
shared-triangulation shape (J5/J6). For gridded points prefer
knn.grid_triangles (closed form, no construction cost).

Pure numpy incremental Bowyer-Watson: for each point, find triangles
whose circumcircle contains it (vectorized predicate over all current
triangles), remove them, re-triangulate the boundary polygon. O(n^2)
worst case — guarded by ``max_points`` (the reference's point files
are small; a corpus-scale point set should use fill_idw_distributed,
whose candidate step needs no triangulation).
"""

from __future__ import annotations

import numpy as np


def _circumcircles(pts: np.ndarray, tris: np.ndarray):
    """(centers, r2) of each triangle's circumcircle."""
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    d = 2.0 * (a[:, 0] * (b[:, 1] - c[:, 1]) + b[:, 0] * (c[:, 1] - a[:, 1])
               + c[:, 0] * (a[:, 1] - b[:, 1]))
    d = np.where(d == 0.0, np.nan, d)
    a2 = (a * a).sum(1)
    b2 = (b * b).sum(1)
    c2 = (c * c).sum(1)
    ux = (a2 * (b[:, 1] - c[:, 1]) + b2 * (c[:, 1] - a[:, 1])
          + c2 * (a[:, 1] - b[:, 1])) / d
    uy = (a2 * (c[:, 0] - b[:, 0]) + b2 * (a[:, 0] - c[:, 0])
          + c2 * (b[:, 0] - a[:, 0])) / d
    centers = np.stack([ux, uy], axis=1)
    r2 = ((a - centers) ** 2).sum(1)
    return centers, r2


def delaunay_triangles(x, y, max_points: int = 20_000) -> np.ndarray:
    """(n_tri, 3) index table of the Delaunay triangulation of scattered
    points — the precomputed-triangles input to knn.fill_barycentric.

    Refuses more than ``max_points`` points (incremental insertion is
    O(n^2) worst case and the table is meant to ride a broadcast task
    closure): at that scale use fill_idw_distributed instead, or pass
    a triangle table computed offline."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    if n > max_points:
        raise ValueError(
            f"delaunay_triangles builds the triangulation on the driver "
            f"(the reference's shared-triangulation shape); {n} points "
            f"> max_points={max_points}. Use fill_idw_distributed for "
            f"corpus-scale point sets, or raise max_points explicitly.")
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)

    # super-triangle comfortably containing every point
    cx, cy = x.mean(), y.mean()
    span = max(x.max() - x.min(), y.max() - y.min(), 1.0) * 64.0
    pts = np.concatenate([
        np.stack([x, y], axis=1),
        np.array([[cx - span, cy - span],
                  [cx + span, cy - span],
                  [cx, cy + span]]),
    ])
    tris = np.array([[n, n + 1, n + 2]], dtype=np.int64)
    centers, r2 = _circumcircles(pts, tris)

    # deterministic insertion order (input order): same input -> same
    # triangle table on every build
    for p in range(n):
        pt = pts[p]
        dd = ((centers - pt) ** 2).sum(1)
        bad = dd <= r2 * (1.0 + 1e-12)      # in/on circumcircle
        if not bad.any():                    # numeric corner: nearest wins
            bad = dd - r2 <= (dd - r2).min() + 1e-9
        # boundary = edges of the bad region appearing exactly once
        # (shared edges are interior to the re-triangulated cavity)
        edges: dict = {}
        for t in tris[bad]:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edges[key] = edges.get(key, 0) + 1
        boundary = [e for e, cnt in edges.items() if cnt == 1]
        new = np.array([[a, b, p] for (a, b) in boundary], dtype=np.int64)
        tris = np.concatenate([tris[~bad], new])
        nc, nr = _circumcircles(pts, new)
        centers = np.concatenate([centers[~bad], nc])
        r2 = np.concatenate([r2[~bad], nr])

    keep = (tris < n).all(axis=1)            # drop super-triangle verts
    return np.ascontiguousarray(tris[keep])
