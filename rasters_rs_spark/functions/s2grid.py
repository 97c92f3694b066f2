"""S2-style quad-sphere cell index, pure Catalyst.

The engine's planar indexes (square WM tiles in `functions/mercator.py`,
hexagons in `functions/hexgrid.py`) cover the projected plane; this
module adds the global-sphere cell index of the brief's H3/S2 layer,
following the published S2 geometry design (s2geometry.io — public):

1. a direction vector (vx, vy, vz) selects one of 6 cube faces
   (largest absolute component, S2's face order +x +y +z -x -y -z);
2. the in-face coordinates (u, v) = ratios of the two minor components
   to the major one;
3. the quadratic projection st = (sqrt(1 + 3u) / 2 | 1 - sqrt(1-3u)/2)
   equalizes cell areas across the face;
4. (i, j) = floor(st * 2^level) discretizes to the level's grid, and a
   Hilbert curve over (i, j) gives the hierarchical, locality-
   preserving cell id:  cell = face * 4^level + hilbert(i, j).

Simplification vs production S2 (documented, deliberate): the Hilbert
orientation is uniform per face rather than S2's per-face initial
orientation + swap/invert bit propagation, so ids differ from
libs2's — the properties that matter for an analytics index (bijective
per level, equal-area-ish, range-locality, face-hierarchical prefix)
are identical.

Everything is a pure Catalyst expression chain, mirrored exactly in
DuckDB SQL (`s2_cell_sql`): inputs need NOT be normalized (faces and
u, v are scale-invariant ratios), and the only operations are IEEE
+,-,*,/ and correctly-rounded sqrt plus floor/abs/CASE and integer
bit logic — bit-identical across both engines.  Callers must not pass
the zero vector (ANSI division); any nonzero scale is fine.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dlit(v: float) -> str:
    """DuckDB DOUBLE literal (bare decimals parse as DECIMAL)."""
    return f"{v:.17e}"


# (u, v) numerator/denominator component picks per face, S2's canonical
# valid_face_xyz_to_uv table: face -> (u_num, u_sign, v_num, v_sign, den)
_FACE_UV = {
    0: ("y", 1, "z", 1, "x"),
    1: ("x", -1, "z", 1, "y"),
    2: ("x", -1, "y", -1, "z"),
    3: ("z", 1, "y", 1, "x"),
    4: ("z", 1, "x", -1, "y"),
    5: ("y", -1, "x", -1, "z"),
}


def with_s2_cell(df: DataFrame, vx_col: str = "vx", vy_col: str = "vy",
                 vz_col: str = "vz", level: int = 8,
                 out: str = "s2_cell") -> DataFrame:
    """Assign each direction vector its S2-style cell id at ``level``
    as a long column — pure Catalyst (6-way face CASE, quadratic st,
    then the unrolled Hilbert recurrence shared with the tile sink)."""
    # lazy import: generic Hilbert lives with the cell-join layer
    from rasters_rs_spark.operators.celljoin import with_hilbert

    vx = F.col(vx_col).cast("double")
    vy = F.col(vy_col).cast("double")
    vz = F.col(vz_col).cast("double")
    df = df.withColumn("_ax", F.abs(vx)).withColumn("_ay", F.abs(vy)) \
           .withColumn("_az", F.abs(vz))
    axis = F.when(F.col("_ax") > F.col("_ay"),
                  F.when(F.col("_ax") > F.col("_az"), F.lit(0))
                   .otherwise(F.lit(2))) \
            .otherwise(F.when(F.col("_ay") > F.col("_az"), F.lit(1))
                        .otherwise(F.lit(2)))
    df = df.withColumn("_axis", axis)
    comp = {"x": vx, "y": vy, "z": vz}
    neg = {0: vx < 0, 1: vy < 0, 2: vz < 0}
    face = F.col("_axis") + F.when(
        (F.col("_axis") == 0) & neg[0], F.lit(3)).when(
        (F.col("_axis") == 1) & neg[1], F.lit(3)).when(
        (F.col("_axis") == 2) & neg[2], F.lit(3)).otherwise(F.lit(0))
    df = df.withColumn("_face", face)
    u_expr, v_expr = None, None
    for f_id, (un, us, vn, vs, den) in _FACE_UV.items():
        u_val = (comp[un] * F.lit(float(us))) / comp[den]
        v_val = (comp[vn] * F.lit(float(vs))) / comp[den]
        cond = F.col("_face") == f_id
        u_expr = F.when(cond, u_val) if u_expr is None \
            else u_expr.when(cond, u_val)
        v_expr = v_expr.when(cond, v_val) if v_expr is not None \
            else F.when(cond, v_val)
    df = df.withColumn("_u", u_expr).withColumn("_v", v_expr)

    def st(c):
        return F.when(c >= 0,
                      F.lit(0.5) * F.sqrt(F.lit(1.0) + F.lit(3.0) * c)) \
                .otherwise(F.lit(1.0)
                           - F.lit(0.5) * F.sqrt(F.lit(1.0) - F.lit(3.0) * c))

    n = 1 << level
    df = df.withColumn("_s", st(F.col("_u"))).withColumn("_t", st(F.col("_v")))

    def ij(c):
        return F.least(F.greatest(F.floor(c * F.lit(float(n))),
                                  F.lit(0)), F.lit(n - 1)).cast("long")

    df = df.withColumn("_i", ij(F.col("_s"))).withColumn("_j", ij(F.col("_t")))
    df = with_hilbert(df, "_i", "_j", bits=level, out="_s2hd")
    cell = (F.col("_face").cast("long") * F.lit(1 << (2 * level)).cast("long")
            + F.col("_s2hd"))
    return df.withColumn(out, cell) \
             .drop("_ax", "_ay", "_az", "_axis", "_face", "_u", "_v",
                   "_s", "_t", "_i", "_j", "_s2hd")


def s2_cell_sql(vx_sql: str, vy_sql: str, vz_sql: str, level: int,
                from_clause: str, extra_cols: str = "",
                out: str = "s2_cell") -> str:
    """DuckDB mirror of :func:`with_s2_cell`: identical expression tree
    (face CASE table, quadratic st, the same unrolled Hilbert levels
    the engine's ``with_hilbert`` evaluates), identical literals."""
    carry = f"{extra_cols}, " if extra_cols else ""
    n = 1 << level
    uv_cases_u, uv_cases_v = [], []
    for f_id, (un, us, vn, vs, den) in _FACE_UV.items():
        sgn_u = "" if us > 0 else "-"
        sgn_v = "" if vs > 0 else "-"
        uv_cases_u.append(
            f"WHEN face = {f_id} THEN ({sgn_u}v{un}) / v{den}")
        uv_cases_v.append(
            f"WHEN face = {f_id} THEN ({sgn_v}v{vn}) / v{den}")
    u_case = "CASE " + " ".join(uv_cases_u) + " END"
    v_case = "CASE " + " ".join(uv_cases_v) + " END"
    half, one, three = _dlit(0.5), _dlit(1.0), _dlit(3.0)

    def st(c):
        return (f"CASE WHEN {c} >= 0 THEN {half} * sqrt({one} + {three} * {c})"
                f" ELSE {one} - {half} * sqrt({one} - {three} * {c}) END")

    def ij(c):
        return (f"CAST(least(greatest(floor({c} * {_dlit(float(n))}), 0), "
                f"{n - 1}) AS BIGINT)")

    ctes = [f"""_v0 AS (
          SELECT {carry} ({vx_sql}) AS vx, ({vy_sql}) AS vy,
                 ({vz_sql}) AS vz
          {from_clause}),
        _v1 AS (
          SELECT {carry} vx, vy, vz,
                 CASE WHEN abs(vx) > abs(vy)
                      THEN (CASE WHEN abs(vx) > abs(vz) THEN 0 ELSE 2 END)
                      ELSE (CASE WHEN abs(vy) > abs(vz) THEN 1 ELSE 2 END)
                 END AS axis
          FROM _v0),
        _v2 AS (
          SELECT {carry} vx, vy, vz,
                 axis + (CASE WHEN (axis = 0 AND vx < 0)
                               OR (axis = 1 AND vy < 0)
                               OR (axis = 2 AND vz < 0)
                         THEN 3 ELSE 0 END) AS face
          FROM _v1),
        _v3 AS (
          SELECT {carry} face, {u_case} AS u, {v_case} AS v
          FROM _v2),
        l{level} AS (
          SELECT {carry} face,
                 {ij(st('u'))} AS hx, {ij(st('v'))} AS hy,
                 CAST(0 AS BIGINT) AS hd
          FROM _v3)"""]
    for lv in range(level - 1, -1, -1):
        s = 1 << lv
        ctes.append(f"""l{lv} AS (
          SELECT {carry} face,
                 hd + {s * s} * xor(
                   3 * (CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END),
                   CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END) AS hd,
                 CASE WHEN (hy & {s}) = 0
                      THEN (CASE WHEN (hx & {s}) > 0
                                 THEN {s - 1} - hy ELSE hy END)
                      ELSE hx END AS hx,
                 CASE WHEN (hy & {s}) = 0
                      THEN (CASE WHEN (hx & {s}) > 0
                                 THEN {s - 1} - hx ELSE hx END)
                      ELSE hy END AS hy
          FROM l{lv + 1})""")
    return ("WITH " + ",\n".join(ctes)
            + f" SELECT {carry} CAST(face AS BIGINT) * {1 << (2 * level)}"
              f" + hd AS {out} FROM l0")


# ---------------------------------------------------------------------------
# numpy mirrors (tests)
# ---------------------------------------------------------------------------

def s2_cell_np(vx, vy, vz, level: int = 8):
    """Vectorized numpy mirror of :func:`with_s2_cell`."""
    from rasters_rs_spark.operators.celljoin import hilbert_xy2d

    vx = np.asarray(vx, dtype=np.float64)
    vy = np.asarray(vy, dtype=np.float64)
    vz = np.asarray(vz, dtype=np.float64)
    ax, ay, az = np.abs(vx), np.abs(vy), np.abs(vz)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2),
                    np.where(ay > az, 1, 2))
    major = np.choose(axis, [vx, vy, vz])
    face = axis + np.where(major < 0, 3, 0)
    comp = {"x": vx, "y": vy, "z": vz}
    u = np.empty_like(vx)
    v = np.empty_like(vx)
    for f_id, (un, us, vn, vs, den) in _FACE_UV.items():
        m = face == f_id
        u[m] = (comp[un][m] * float(us)) / comp[den][m]
        v[m] = (comp[vn][m] * float(vs)) / comp[den][m]

    def st(c):
        cp = np.where(c >= 0, c, 0.0)
        cn = np.where(c >= 0, 0.0, c)
        return np.where(c >= 0, 0.5 * np.sqrt(1.0 + 3.0 * cp),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * cn))

    n = 1 << level
    i = np.clip(np.floor(st(u) * float(n)), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor(st(v) * float(n)), 0, n - 1).astype(np.int64)
    hd = np.array([hilbert_xy2d(int(a), int(b), bits=level)
                   for a, b in zip(i, j)], dtype=np.int64)
    return face.astype(np.int64) * (1 << (2 * level)) + hd


def s2_cell_center_np(cell, level: int = 8):
    """Unit direction vector of a cell's center (tests: round-trip)."""
    from rasters_rs_spark.operators.celljoin import hilbert_xy2d

    cell = np.asarray(cell, dtype=np.int64)
    n = 1 << level
    face = cell // (n * n)
    hd = cell % (n * n)
    # invert hilbert by brute table per unique (i, j) is wasteful; use
    # the standard d2xy recurrence instead
    ij = np.array([_hilbert_d2xy(int(d), level) for d in hd], dtype=np.int64)
    i, j = ij[:, 0], ij[:, 1]
    s = (i.astype(np.float64) + 0.5) / float(n)
    t = (j.astype(np.float64) + 0.5) / float(n)

    def st_to_uv(c):
        return np.where(c >= 0.5, (4.0 * c * c - 1.0) / 3.0,
                        (1.0 - 4.0 * (1.0 - c) * (1.0 - c)) / 3.0)

    u, v = st_to_uv(s), st_to_uv(t)
    out = np.zeros((len(cell), 3), dtype=np.float64)
    for f_id in range(6):
        m = face == f_id
        if not m.any():
            continue
        un, us, vn, vs, den = _FACE_UV[f_id]
        sign = -1.0 if f_id >= 3 else 1.0
        vec = {den: np.full(m.sum(), sign)}
        vec[un] = u[m] * float(us) * sign
        vec[vn] = v[m] * float(vs) * sign
        out[m, 0] = vec["x"]
        out[m, 1] = vec["y"]
        out[m, 2] = vec["z"]
    norm = np.sqrt((out * out).sum(axis=1))
    return out / norm[:, None]


def _hilbert_d2xy(d: int, bits: int):
    """Standard Hilbert d2xy (inverse of celljoin.hilbert_xy2d)."""
    x = y = 0
    t = d
    s = 1
    while s < (1 << bits):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y
