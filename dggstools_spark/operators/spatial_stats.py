"""Grid-native spatial statistics over DGGS cell tables: focal (moving-
window) smoothing and global spatial autocorrelation (Moran's I).

The analytics layer a DGGS engine exists to enable: once data is keyed by
rHEALPix cells, neighborhood operations become pure relational algebra on
the (face, row, col) lattice — no geometry library, no spatial index.
Cell → lattice uses the closed form of the cellid digit string: digit d
at depth i contributes (d div 3, d mod 3) · 3^(res-1-i) to (row, col)
(dggs/cells.cellids_to_face_rowcol:137-142 is the numpy twin; the SQL
here is digit-for-digit the same fold, so both engines derive identical
lattice coordinates).

- ``focal_mean``: queen-adjacency (3×3) moving average of a cell value —
  the classic raster focal/smoothing op (reference rescale is the parent
  rollup; this is the SAME-resolution window).  Adjacency within a face:
  offsets explode (9 rows per cell) → one hash equi-join on
  (face, row, col) → one agg.  Cells on face edges simply match fewer
  neighbors (documented interior-adjacency semantics — cross-face
  wraps are a cell-topology concern the reference also never exposes).
  SEAM VISIBILITY (VERDICT r5): every per-cell op emits ``on_seam``
  (1 iff the cell touches its face boundary, i.e. row or col is 0 or
  3^res−1 — a closed form of the cellid, engine-exact), and the global
  morans_i row carries ``n_seam_cells``, so face-boundary cells whose
  neighborhoods are under-counted are identifiable/filterable
  downstream instead of silently under-weighted.
- ``morans_i``: global Moran's I under 8-neighbor (queen) weights,
  computed EXACTLY in integer arithmetic: values are centered on the
  TRUNCATED integer mean (d_i = x_i - (Σx div N); Spark `div` and
  DuckDB `//` both truncate toward zero — for a negative value sum the
  center is the truncated mean, NOT the floor; numpy `//` DOES floor
  and would disagree on negative sums, the same sign-semantics family
  as CLAUDE.md constraint 5.  Deterministic, engine-exact; the classic
  real-mean centering differs by O(1/N) and is not
  integer-representable), and

      I_ppm = (N · Σ_{ij adj} d_i d_j · 1e6) div (W · Σ d_i²)

  evaluated in DECIMAL(38,0)/HUGEINT so the product never overflows
  (CLAUDE.md constraint 13 family — no float aggregation anywhere).

Scale design (100 TB): the cell table arrives post-aggregation (cells ≪
points); both ops are one 9× offset explode + one shuffle hash join on
the natural (face, row, col) key + map-side-combining aggregates.  The
lattice decode runs AFTER the groupBy so the giant encode expression is
never re-inlined (CLAUDE.md constraint 2 — the agg is the lineage
boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PPM = 1_000_000

#: queen adjacency (excl. self)
_NEIGHBOR_OFFSETS = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                     if not (dr == 0 and dc == 0)]


def _rowcol_terms(res: int, idiv: str) -> "tuple[str, str]":
    """(row_sql, col_sql) from a same-res `cellid` string column — the
    digit fold of cellids_to_face_rowcol as flat SQL (res terms each)."""
    row_terms, col_terms = [], []
    for i in range(1, res + 1):
        digit = f"CAST(substring(cellid, {i + 1}, 1) AS BIGINT)"
        w = 3 ** (res - i)
        row_terms.append(f"(({digit}) {idiv} 3) * {w}")
        col_terms.append(f"(({digit}) % 3) * {w}")
    return " + ".join(row_terms), " + ".join(col_terms)


def face_sql() -> str:
    """0..5 face index from the cellid head char (portable)."""
    return "instr('NOPQRS', substring(cellid, 1, 1)) - 1"


def _rowcol_terms_ascii(res: int) -> "tuple[str, str]":
    """Spark-side twin of _rowcol_terms reading digits via ascii()-48
    instead of CAST(substring AS BIGINT) — identical values for the
    '0'..'8' digit alphabet, but TOTAL under ANSI mode: a lazily
    composed plan (kring_cells r7) can push a later level's decode
    predicate into the same Filter as an earlier level's range check,
    and subexpression elimination then evaluates the decode on builder
    outputs carrying chr(48+negative) placeholder digits that the range
    check is about to drop — CAST throws there, ascii() just yields a
    negative that fails the range check as intended.  DuckDB twins keep
    the original text (frozen oracle SQL)."""
    row_terms, col_terms = [], []
    for i in range(1, res + 1):
        digit = f"(ascii(substring(cellid, {i + 1}, 1)) - 48)"
        w = 3 ** (res - i)
        row_terms.append(f"(({digit}) div 3) * {w}")
        col_terms.append(f"(({digit}) % 3) * {w}")
    # BIGINT like the CAST-based original — with_lattice's row/col reach
    # query outputs (schema-hashed by the oracle gate)
    return (f"CAST({' + '.join(row_terms)} AS BIGINT)",
            f"CAST({' + '.join(col_terms)} AS BIGINT)")


def with_lattice(cells: DataFrame, res: int) -> DataFrame:
    """Add (face, row, col) lattice coordinates to a same-res cell table."""
    row_sql, col_sql = _rowcol_terms_ascii(res)
    return (cells
            .withColumn("face", F.expr(face_sql()).cast("int"))
            .withColumn("row", F.expr(row_sql))
            .withColumn("col", F.expr(col_sql)))


def lattice_select_sql(source_sql: str, res: int,
                       value_col: str = "v") -> str:
    """DuckDB twin of with_lattice over ``source_sql`` → (cellid, v,
    face, row, col)."""
    row_sql, col_sql = _rowcol_terms(res, "//")
    # src MATERIALIZED: cellid is referenced ~2·res+1 times below — if the
    # source contains the expression encoder, DuckDB would inline the
    # ~50k-node tree into every digit reference (CLAUDE.md constraint 7)
    return f"""
    WITH _src AS MATERIALIZED ({source_sql})
    SELECT cellid, {value_col} AS v,
           CAST({face_sql()} AS INT) AS face,
           CAST({row_sql} AS BIGINT) AS row,
           CAST({col_sql} AS BIGINT) AS col
    FROM _src
    """


def seam_pred_sql(res: int) -> str:
    """Boolean SQL over (row, col): cell touches its face boundary at
    ``res`` (queen neighborhood crosses the seam → under-counted)."""
    edge = 3 ** res - 1
    return (f"(row = 0 OR col = 0 OR row = {edge} OR col = {edge})")


def _offsets_sql(include_self: bool) -> str:
    offs = (_NEIGHBOR_OFFSETS + [(0, 0)]) if include_self \
        else _NEIGHBOR_OFFSETS
    rows = ", ".join(f"struct({dr} AS dr, {dc} AS dc)" for dr, dc in offs)
    return f"explode(array({rows}))"


# --------------------------------------------------------------------------
# cross-face seam closure (VERDICT r5 "What's missing" #3)
#
# With cross_face=True the queen neighborhood is closed ACROSS face seams
# using the kernel-derived cube gluing (dggs/topology.edge_table): every
# seam cell contributes its value to the 2-3 cells it touches on the glued
# face (the direct cell at t2 = flip ? E-1-t : t plus the in-range edge
# diagonals t2±1).  The construction is symmetric because the gluing table
# is an involution (asserted at derivation), so A contributes to B iff B
# contributes to A.  After closure every cell has the full 8-neighbor
# queen set except the 24 cube-corner cells (7 — the across-corner
# diagonal does not exist on a cube; their three corner cells are instead
# mutually edge-adjacent).
#
# Scale shape: seam cells are O(6·4·3^res) = O(sqrt(cells)) — the
# cross-face branch filters to them, broadcast-joins the 24-row gluing
# table, explodes 3 target slots, and unions into the same single
# (face,row,col) hash join + aggregate the interior path uses.  No new
# shuffle family, no UDF.
# --------------------------------------------------------------------------


def _xface_contrib(lat: DataFrame, res: int) -> DataFrame:
    """Cross-face neighbor contributions (face, row, col, nv) for every
    seam cell of ``lat`` (face, row, col, v) — see block comment above.

    r7: the 24-row gluing table is compiled into the _nbr_slot_exprs
    CASE expressions (seam slots only) instead of a per-call driver
    createDataFrame + broadcast join (~0.3-0.4 s fixed latency each);
    identical (edge, dt) → target mapping, A/B-verified against the
    join form on the full res-1..3 lattices."""
    seam = _nbr_slot_exprs(res, True)[len(_NEIGHBOR_OFFSETS):]
    return (lat
            .select(F.col("v").alias("nv"), F.explode(F.expr(
                "filter(array(" + ", ".join(seam)
                + "), x -> x IS NOT NULL)")).alias("_x"))
            .select(F.col("_x.f").alias("face"),
                    F.col("_x.r").alias("row"),
                    F.col("_x.c").alias("col"),
                    "nv"))


def _xface_contrib_sql(lat_cte: str, res: int) -> str:
    """DuckDB twin of _xface_contrib over CTE ``lat_cte`` (same gluing
    table, same expressions — shared-snippet rule)."""
    from ..dggs.topology import edge_table_rows

    E = 3 ** res
    vals = ", ".join(f"({f}, {e}, {f2}, {e2}, {fl})"
                     for f, e, f2, e2, fl in edge_table_rows())
    return f"""
        SELECT q.face2 AS face,
               CAST(CASE WHEN q.edge2 = 0 THEN 0
                         WHEN q.edge2 = 2 THEN {E - 1}
                         ELSE q.t2 + d.dt END AS BIGINT) AS row,
               CAST(CASE WHEN q.edge2 IN (0, 2) THEN q.t2 + d.dt
                         WHEN q.edge2 = 1 THEN {E - 1}
                         ELSE 0 END AS BIGINT) AS col,
               q.nv
        FROM (SELECT t.face2, t.edge2, s.nv,
                     CASE WHEN t.flip = 1 THEN {E - 1} - s.tpos
                          ELSE s.tpos END AS t2
              FROM (SELECT l.face, e.edge, l.v AS nv,
                           CASE WHEN e.edge IN (0, 2) THEN l.col
                                ELSE l.row END AS tpos
                    FROM {lat_cte} l
                    JOIN (VALUES (0), (1), (2), (3)) e(edge)
                      ON (e.edge = 0 AND l.row = 0)
                      OR (e.edge = 1 AND l.col = {E - 1})
                      OR (e.edge = 2 AND l.row = {E - 1})
                      OR (e.edge = 3 AND l.col = 0)) s
              JOIN (VALUES {vals}) t(face, edge, face2, edge2, flip)
                ON t.face = s.face AND t.edge = s.edge) q
        CROSS JOIN (VALUES (-1), (0), (1)) d(dt)
        WHERE q.t2 + d.dt BETWEEN 0 AND {E - 1}
    """


def focal_mean(cells: DataFrame, res: int,
               value_col: str = "v", cross_face: bool = False) -> DataFrame:
    """(cellid, v, n_window, focal_sum, focal_mean_ppm, on_seam): 3×3
    queen-window mean (incl. self) of an integer cell value, exact ppm.
    Cells at face edges average over the neighbors that exist
    (n_window < 9); ``on_seam`` = 1 iff the cell touches its face
    boundary (neighborhood crosses the seam — see module docstring).
    With ``cross_face=True`` the window is closed ACROSS face seams via
    the kernel-derived cube gluing (see the seam-closure block comment):
    on a fully-populated sphere every cell then has n_window = 9 except
    the 24 cube-corner cells (8)."""
    lat = (with_lattice(cells.select("cellid",
                                     F.col(value_col).alias("v")), res)
           .withColumn("on_seam",
                       F.expr(seam_pred_sql(res)).cast("int")))
    contrib = (lat
               .select("face", "row", "col", "v",
                       F.expr(_offsets_sql(True)).alias("o"))
               .select("face",
                       (F.col("row") + F.col("o.dr")).alias("row"),
                       (F.col("col") + F.col("o.dc")).alias("col"),
                       F.col("v").alias("nv")))
    if cross_face:
        contrib = contrib.unionByName(_xface_contrib(lat, res))
    return (lat.join(contrib, ["face", "row", "col"])
            .groupBy("cellid", "v", "on_seam")
            .agg(F.count("*").alias("n_window"),
                 F.sum("nv").alias("focal_sum"))
            .withColumn("focal_mean_ppm",
                        F.expr(f"(focal_sum * {PPM}) div n_window"))
            .select("cellid", "v", "n_window", "focal_sum",
                    "focal_mean_ppm", "on_seam"))


def focal_mean_sql(source_sql: str, res: int,
                   value_col: str = "v", cross_face: bool = False) -> str:
    """DuckDB twin of focal_mean; ``source_sql`` yields (cellid, v)."""
    lat = lattice_select_sql(source_sql, res, value_col)
    offs = " UNION ALL ".join(
        f"SELECT {dr} AS dr, {dc} AS dc"
        for dr, dc in _NEIGHBOR_OFFSETS + [(0, 0)])
    seam = seam_pred_sql(res)
    xsql = (f"UNION ALL {_xface_contrib_sql('lat', res)}"
            if cross_face else "")
    return f"""
    WITH lat AS MATERIALIZED ({lat}),
    contrib AS (
        SELECT face, row + dr AS row, col + dc AS col, v AS nv
        FROM lat, ({offs}) o
        {xsql})
    SELECT l.cellid, l.v,
           CAST(count(*) AS BIGINT) AS n_window,
           CAST(sum(c.nv) AS BIGINT) AS focal_sum,
           CAST((CAST(sum(c.nv) AS BIGINT) * {PPM}) // count(*) AS BIGINT)
               AS focal_mean_ppm,
           CAST(CASE WHEN {seam} THEN 1 ELSE 0 END AS INT) AS on_seam
    FROM lat l JOIN contrib c USING (face, row, col)
    GROUP BY l.cellid, l.v, CASE WHEN {seam} THEN 1 ELSE 0 END
    """


def morans_i(cells: DataFrame, res: int,
             value_col: str = "v", cross_face: bool = False) -> DataFrame:
    """One row (n_cells, w_pairs, pair_sum, ssq, morans_i_ppm,
    n_seam_cells): global Moran's I under queen weights, truncated-mean
    centered, exact integers (see module docstring).  morans_i_ppm ≈
    I · 1e6; positive = clustered, ~0 = random, negative = dispersed.
    ``n_seam_cells`` counts cells on a face boundary (their queen
    neighborhoods are under-counted — seam visibility, VERDICT r5);
    with ``cross_face=True`` those neighborhoods are CLOSED across the
    seams via the cube gluing (w_pairs then counts the seam pairs too,
    so I is the true whole-sphere statistic, not the per-face one)."""
    lat = with_lattice(cells.select("cellid", F.col(value_col).alias("v")),
                       res).localCheckpoint(eager=True)  # reused 3×; tiny
    mean = lat.agg(F.sum("v").alias("_s"), F.count("*").alias("_n"))
    d = (lat.crossJoin(F.broadcast(mean))
         .select("face", "row", "col",
                 F.expr("v - (_s div _n)").alias("d"),
                 F.expr(seam_pred_sql(res)).cast("int").alias("on_seam")))
    nbr = (d.select("face", "row", "col", F.col("d").alias("nd"))
           .select("face", "row", "col", "nd",
                   F.expr(_offsets_sql(False)).alias("o"))
           .select("face",
                   (F.col("row") + F.col("o.dr")).alias("row"),
                   (F.col("col") + F.col("o.dc")).alias("col"), "nd"))
    if cross_face:
        nbr = nbr.unionByName(
            _xface_contrib(d.select("face", "row", "col",
                                    F.col("d").alias("v")), res)
            .withColumnRenamed("nv", "nd"))
    pairs = (d.join(nbr, ["face", "row", "col"])
             .agg(F.count("*").alias("w_pairs"),
                  F.sum(F.col("d") * F.col("nd")).alias("pair_sum")))
    tot = d.agg(F.count("*").alias("n_cells"),
                F.sum(F.expr("d * d")).alias("ssq"),
                F.sum("on_seam").alias("n_seam_cells"))
    return (tot.crossJoin(pairs)
            .withColumn("morans_i_ppm", F.expr(
                f"CAST((CAST(n_cells AS DECIMAL(38,0)) * pair_sum * {PPM})"
                f" div (CAST(w_pairs AS DECIMAL(38,0)) * ssq) AS BIGINT)"))
            .select("n_cells", "w_pairs", "pair_sum", "ssq",
                    "morans_i_ppm", "n_seam_cells"))


def morans_i_sql(source_sql: str, res: int, value_col: str = "v",
                 cross_face: bool = False) -> str:
    """DuckDB twin of morans_i (HUGEINT keeps the product exact)."""
    lat = lattice_select_sql(source_sql, res, value_col)
    seam = seam_pred_sql(res)
    offs = " UNION ALL ".join(
        f"SELECT {dr} AS dr, {dc} AS dc" for dr, dc in _NEIGHBOR_OFFSETS)
    xsql = (f"UNION ALL SELECT face, row, col, nv AS nd FROM"
            f" ({_xface_contrib_sql('dv', res)}) _x"
            if cross_face else "")
    return f"""
    WITH lat AS MATERIALIZED ({lat}),
    m AS (SELECT sum(v) AS _s, count(*) AS _n FROM lat),
    d AS MATERIALIZED (
        SELECT face, row, col, v - (SELECT _s // _n FROM m) AS d,
               CASE WHEN {seam} THEN 1 ELSE 0 END AS on_seam FROM lat),
    dv AS (SELECT face, row, col, d AS v FROM d),
    nbr AS (SELECT face, row + dr AS row, col + dc AS col, d AS nd
            FROM d, ({offs}) o
            {xsql}),
    pairs AS (SELECT count(*) AS w_pairs,
                     CAST(sum(d.d * nbr.nd) AS BIGINT) AS pair_sum
              FROM d JOIN nbr USING (face, row, col)),
    tot AS (SELECT count(*) AS n_cells,
                   CAST(sum(d * d) AS BIGINT) AS ssq,
                   CAST(sum(on_seam) AS BIGINT) AS n_seam_cells FROM d)
    SELECT CAST(n_cells AS BIGINT) AS n_cells,
           CAST(w_pairs AS BIGINT) AS w_pairs,
           pair_sum, ssq,
           CAST((CAST(n_cells AS HUGEINT) * pair_sum * {PPM})
                // (CAST(w_pairs AS HUGEINT) * ssq) AS BIGINT)
               AS morans_i_ppm,
           n_seam_cells
    FROM tot, pairs
    """


def hotspots(cells: DataFrame, res: int, k: int,
             value_col: str = "v", cross_face: bool = False) -> DataFrame:
    """(cellid, v, n_window, focal_sum, ratio_ppm, rank, on_seam):
    Getis-Ord-style
    local hotspot score — the 3×3 window mean relative to the global mean,
    exact integer ppm:

        ratio_ppm = (focal_sum · N · 1e6) div (n_window · Σv)

    (> 1e6 ⇒ locally hotter than the corpus average), top-``k`` by
    (ratio desc, cellid).  One extra single-row broadcast + the
    WindowGroupLimit rank cut on top of focal_mean's plan."""
    from pyspark.sql.window import Window

    tot = cells.agg(F.sum(value_col).alias("_tv"),
                    F.count("*").alias("_tn"))
    w = Window.orderBy(F.desc("ratio_ppm"), F.asc("cellid"))
    return (focal_mean(cells, res, value_col, cross_face=cross_face)
            .crossJoin(F.broadcast(tot))
            .withColumn("ratio_ppm", F.expr(
                f"(focal_sum * _tn * {PPM}) div (n_window * _tv)"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("cellid", "v", "n_window", "focal_sum",
                    "ratio_ppm", "rank", "on_seam"))


def hotspots_sql(source_sql: str, res: int, k: int,
                 value_col: str = "v", cross_face: bool = False) -> str:
    """DuckDB twin of hotspots."""
    focal = focal_mean_sql(source_sql, res, value_col,
                           cross_face=cross_face)
    return f"""
    WITH f AS MATERIALIZED ({focal}),
    tot AS (SELECT sum(v) AS _tv, count(*) AS _tn FROM f)
    SELECT cellid, v, n_window, focal_sum, ratio_ppm,
           CAST(rank AS INT) AS rank, on_seam
    FROM (
        SELECT f.*, CAST((focal_sum * _tn * {PPM}) // (n_window * _tv)
                         AS BIGINT) AS ratio_ppm,
               row_number() OVER (
                   ORDER BY (focal_sum * _tn * {PPM}) // (n_window * _tv)
                            DESC, cellid) AS rank
        FROM f, tot)
    WHERE rank <= {k}
    """


def local_moran(cells: DataFrame, res: int, k: int,
                value_col: str = "v",
                cross_face: bool = False) -> DataFrame:
    """(cellid, d, nbr_sum, n_nbrs, lisa, quadrant, rank, on_seam):
    per-cell LISA
    (Anselin's local Moran's I, unnormalized integer core): with d_i the
    truncated-mean-centered value (div/// semantics, toward zero — NOT
    numpy floor), lisa_i = d_i · Σ_{j adj i} d_j — positive
    where a cell RESEMBLES its neighborhood (HH or LL cluster), negative
    where it is an OUTLIER (high in a low pocket or vice versa).
    ``quadrant`` labels HH/LL/HL/LH by the signs of d and the neighbor
    sum; output is the top-``k`` |lisa| cells (WindowGroupLimit), the
    "which cells are anomalous" drill-down of the global morans_i.

    Same plan family as focal_mean: one offset explode + one hash
    equi-join + per-cell agg, all exact integers."""
    from pyspark.sql.window import Window

    lat = with_lattice(cells.select("cellid", F.col(value_col).alias("v")),
                       res).localCheckpoint(eager=True)  # reused twice
    mean = lat.agg(F.sum("v").alias("_s"), F.count("*").alias("_n"))
    d = (lat.crossJoin(F.broadcast(mean))
         .select("cellid", "face", "row", "col",
                 F.expr("v - (_s div _n)").alias("d"),
                 F.expr(seam_pred_sql(res)).cast("int").alias("on_seam")))
    nbr = (d.select("face", "row", "col", F.col("d").alias("nd"))
           .select("face", "row", "col", "nd",
                   F.expr(_offsets_sql(False)).alias("o"))
           .select("face",
                   (F.col("row") + F.col("o.dr")).alias("row"),
                   (F.col("col") + F.col("o.dc")).alias("col"), "nd"))
    if cross_face:
        nbr = nbr.unionByName(
            _xface_contrib(d.select("face", "row", "col",
                                    F.col("d").alias("v")), res)
            .withColumnRenamed("nv", "nd"))
    per = (d.join(nbr, ["face", "row", "col"])
           .groupBy("cellid", "d", "on_seam")
           .agg(F.sum("nd").alias("nbr_sum"),
                F.count("*").alias("n_nbrs"))
           .withColumn("lisa", F.expr("d * nbr_sum"))
           .withColumn("quadrant", F.expr(
               "CASE WHEN d >= 0 AND nbr_sum >= 0 THEN 'HH'"
               " WHEN d < 0 AND nbr_sum < 0 THEN 'LL'"
               " WHEN d >= 0 THEN 'HL' ELSE 'LH' END")))
    w = Window.orderBy(F.desc(F.abs(F.col("lisa"))), F.asc("cellid"))
    return (per.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("cellid", "d", "nbr_sum", "n_nbrs", "lisa",
                    "quadrant", "rank", "on_seam"))


def local_moran_sql(source_sql: str, res: int, k: int,
                    value_col: str = "v", cross_face: bool = False) -> str:
    """DuckDB twin of local_moran."""
    lat = lattice_select_sql(source_sql, res, value_col)
    seam = seam_pred_sql(res)
    offs = " UNION ALL ".join(
        f"SELECT {dr} AS dr, {dc} AS dc" for dr, dc in _NEIGHBOR_OFFSETS)
    xsql = (f"UNION ALL SELECT face, row, col, nv AS nd FROM"
            f" ({_xface_contrib_sql('dv', res)}) _x"
            if cross_face else "")
    return f"""
    WITH lat AS MATERIALIZED ({lat}),
    m AS (SELECT sum(v) AS _s, count(*) AS _n FROM lat),
    d AS MATERIALIZED (
        SELECT cellid, face, row, col,
               v - (SELECT _s // _n FROM m) AS d,
               CASE WHEN {seam} THEN 1 ELSE 0 END AS on_seam FROM lat),
    dv AS (SELECT face, row, col, d AS v FROM d),
    nbr AS (SELECT face, row + dr AS row, col + dc AS col, d AS nd
            FROM d, ({offs}) o
            {xsql}),
    per AS (
        SELECT d.cellid, CAST(d.d AS BIGINT) AS d,
               CAST(sum(nbr.nd) AS BIGINT) AS nbr_sum,
               CAST(count(*) AS BIGINT) AS n_nbrs,
               CAST(d.on_seam AS INT) AS on_seam
        FROM d JOIN nbr USING (face, row, col)
        GROUP BY d.cellid, d.d, d.on_seam)
    SELECT cellid, d, nbr_sum, n_nbrs,
           CAST(d * nbr_sum AS BIGINT) AS lisa,
           CASE WHEN d >= 0 AND nbr_sum >= 0 THEN 'HH'
                WHEN d < 0 AND nbr_sum < 0 THEN 'LL'
                WHEN d >= 0 THEN 'HL' ELSE 'LH' END AS quadrant,
           CAST(rank AS INT) AS rank, on_seam
    FROM (SELECT *, row_number() OVER (
              ORDER BY abs(d * nbr_sum) DESC, cellid) AS rank FROM per)
    WHERE rank <= {k}
    """


def _lcp(a: str, b: str) -> str:
    out = []
    for x, y in zip(a, b):
        if x != y:
            break
        out.append(x)
    return "".join(out)


def bbox_cells(cells: DataFrame, res: int, corner_a: str,
               corner_b: str, value_col: str = "v") -> DataFrame:
    """Cells inside the lattice rectangle spanned by two same-face corner
    cellids — THE canonical DGGS range query.  Two-stage filter, in scale
    order: (1) prefix prune — every cell in the rectangle shares the
    corners' longest common prefix, a plain ``startswith`` that partition-
    prunes a prefix-partitioned cell store (sources/cells_io layout) and
    row-group-skips parquet; (2) exact (row, col) range from the lattice
    closed form.  Returns (cellid, v, row, col) within the box."""
    fa, fb = corner_a[0], corner_b[0]
    if fa != fb:
        raise ValueError("bbox corners must share a face "
                         f"(got {fa!r} vs {fb!r})")
    if len(corner_a) != res + 1 or len(corner_b) != res + 1:
        raise ValueError("corner cellids must be at the query resolution")
    prefix = _lcp(corner_a, corner_b)
    # value_col mirrors bbox_cells_sql (ADVICE r5): alias to v before the
    # lattice decode, as every sibling op does.
    lat = with_lattice(cells.select("cellid",
                                    F.col(value_col).alias("v")), res)
    ra, rb = sorted((_rowcol_of(corner_a)[0], _rowcol_of(corner_b)[0]))
    ca, cb = sorted((_rowcol_of(corner_a, col=True)[0],
                     _rowcol_of(corner_b, col=True)[0]))
    return (lat
            .filter(F.col("cellid").startswith(prefix))
            .filter((F.col("row") >= ra) & (F.col("row") <= rb)
                    & (F.col("col") >= ca) & (F.col("col") <= cb))
            .select("cellid", "v", "row", "col"))


def _rowcol_of(cellid: str, col: bool = False) -> "tuple[int]":
    """Driver-side (row,) or (col,) of a cellid — the same digit fold."""
    acc = 0
    for ch in cellid[1:]:
        d = int(ch)
        acc = acc * 3 + (d % 3 if col else d // 3)
    return (acc,)


def bbox_cells_sql(source_sql: str, res: int, corner_a: str,
                   corner_b: str, value_col: str = "v") -> str:
    """DuckDB twin of bbox_cells."""
    prefix = _lcp(corner_a, corner_b)
    ra, rb = sorted((_rowcol_of(corner_a)[0], _rowcol_of(corner_b)[0]))
    ca, cb = sorted((_rowcol_of(corner_a, col=True)[0],
                     _rowcol_of(corner_b, col=True)[0]))
    lat = lattice_select_sql(source_sql, res, value_col)
    return f"""
    WITH lat AS MATERIALIZED ({lat})
    SELECT cellid, v, row, col FROM lat
    WHERE cellid LIKE '{prefix}%'
      AND row BETWEEN {ra} AND {rb} AND col BETWEEN {ca} AND {cb}
    """


def cellid_from_rowcol_sql(res: int, idiv: str, face: str = "face",
                           row: str = "row", col: str = "col") -> str:
    """Inverse of the lattice digit fold: SQL building the res-``res``
    cellid string from (face, row, col) expressions — digit at depth i is
    3·row_i + col_i where row_i/col_i are the base-3 digits of row/col.
    Flat per-digit concat (res terms), shared emitter for both engines
    (``idiv`` = 'div' for Spark, '//' for DuckDB; CAST(. AS STRING) and
    substring/concat behave identically — the synth_url_sql convention)."""
    digits = []
    for i in range(1, res + 1):
        w = 3 ** (res - i)
        digits.append(
            f"CAST(((({row}) {idiv} {w}) % 3) * 3"
            f" + ((({col}) {idiv} {w}) % 3) AS STRING)")
    return (f"concat(substring('NOPQRS', ({face}) + 1, 1), "
            + ", ".join(digits) + ")")


def cell_neighbors(cells: DataFrame, res: int,
                   cross_face: bool = True) -> DataFrame:
    """(cellid, nbr, across): every queen neighbor of every input cell —
    the `rhealpixdggs` ``Cell.neighbors`` surface (reference C3/J5 family)
    as pure relational algebra, cross-face CORRECT.

    Neighbors are a property of the GRID, not the table: the output lists
    all 8 queen neighbors per cell (7 for the 24 cube-corner cells — the
    across-corner diagonal does not exist on a cube; their three corner
    cells are mutually edge-adjacent), whether or not the neighbor id
    appears in ``cells``.  ``across`` = 1 marks neighbors reached through
    a face seam (dggs/topology's kernel-derived gluing).  Input cellids
    must be unique and same-res.

    Correctness lean: adjacency is SYMMETRIC, and the seam slots emit,
    for each seam cell c, exactly the glued positions c touches — which
    are therefore c's cross-face neighbors; the involution assert in
    topology.edge_table guarantees the reverse direction would produce
    the mirrored pairs.  Scale/r7: the whole enumeration is ONE slot
    explode (_nbr_slot_exprs — the 24-row gluing table compiled into
    CASE expressions), zero joins: the former broadcast-join seam
    branch paid a driver createDataFrame + BroadcastExchange per call
    (~0.3-0.4 s fixed latency; A/B-verified identical pairs + across
    flags on the full res-1..3 lattices)."""
    lat = with_lattice(cells.select("cellid"), res)
    slots = _nbr_slot_exprs(res, cross_face)
    return (lat
            .select("cellid", F.explode(F.expr(
                "filter(array(" + ", ".join(slots)
                + "), x -> x IS NOT NULL)")).alias("_x"))
            .select("cellid",
                    F.expr(cellid_from_rowcol_sql(
                        res, "div", face="_x.f", row="_x.r",
                        col="_x.c")).alias("nbr"),
                    F.col("_x.a").alias("across")))


def cell_neighbors_sql(source_sql: str, res: int,
                       cross_face: bool = True) -> str:
    """DuckDB twin of :func:`cell_neighbors` (same lattice fold, same
    gluing table, same inverse-fold emitter)."""
    lat = lattice_select_sql(source_sql, res, value_col="cellid")
    E = 3 ** res
    offs = " UNION ALL ".join(
        f"SELECT {dr} AS dr, {dc} AS dc" for dr, dc in _NEIGHBOR_OFFSETS)
    nbr_int = cellid_from_rowcol_sql(res, "//", row="row + o.dr",
                                     col="col + o.dc")
    nbr_x = cellid_from_rowcol_sql(res, "//")
    xsql = (f"""
    UNION ALL
    SELECT nv AS cellid, {nbr_x} AS nbr, 1 AS across
    FROM ({_xface_contrib_sql('lat', res)}) _x""" if cross_face else "")
    return f"""
    WITH lat AS MATERIALIZED ({lat})
    SELECT cellid, {nbr_int} AS nbr, 0 AS across
    FROM lat, ({offs}) o
    WHERE row + o.dr BETWEEN 0 AND {E - 1}
      AND col + o.dc BETWEEN 0 AND {E - 1}
    {xsql}
    """


def mean_center(pts: DataFrame, class_col: str, x_col: str,
                y_col: str) -> DataFrame:
    """(class, n_pts, cx_m, cy_m, std_m): per-class mean center and
    standard distance (the ESRI "mean center" + "standard distance"
    descriptive spatial statistics) over planar-meter point coordinates,
    computed EXACTLY in integers: coordinates quantize to whole meters
    (round of a bit-identical double on both engines — trig products,
    no constraint-17 power-of-two boundary), then

        cx = Σx div n       (truncated integer mean, div/// semantics)
        SD = sqrt(n·(Σx² + Σy²) − (Σx)² − (Σy)²) / n

    with the radicand in DECIMAL(38,0)/HUGEINT (Σx² of ~2e7-meter coords
    overflows BIGINT beyond ~50k rows — constraint-13 family); the final
    sqrt/round runs on the SAME exact integer on both engines.  One hash
    aggregate, map-side combining; no joins, no windows.  Radicand
    headroom: n·Σx² < 1e38 up to ~1e11 points per class."""
    q = pts.select(class_col,
                   F.expr(f"CAST(round({x_col}) AS BIGINT)").alias("xi"),
                   F.expr(f"CAST(round({y_col}) AS BIGINT)").alias("yi"))
    agg = (q.groupBy(class_col)
           .agg(F.count("*").alias("n_pts"),
                F.sum("xi").alias("_sx"), F.sum("yi").alias("_sy"),
                F.sum(F.expr("CAST(xi AS DECIMAL(38,0)) * xi"))
                .alias("_sxx"),
                F.sum(F.expr("CAST(yi AS DECIMAL(38,0)) * yi"))
                .alias("_syy")))
    return (agg
            .withColumn("cx_m", F.expr("_sx div n_pts"))
            .withColumn("cy_m", F.expr("_sy div n_pts"))
            .withColumn("_num", F.expr(
                "CAST(n_pts AS DECIMAL(38,0)) * (_sxx + _syy)"
                " - CAST(_sx AS DECIMAL(38,0)) * _sx"
                " - CAST(_sy AS DECIMAL(38,0)) * _sy"))
            .withColumn("std_m", F.expr(
                "CAST(round(sqrt(CAST(_num AS DOUBLE)) / n_pts)"
                " AS BIGINT)"))
            .select(class_col, "n_pts", "cx_m", "cy_m", "std_m"))


def mean_center_sql(source_sql: str, class_col: str, x_col: str,
                    y_col: str) -> str:
    """DuckDB twin of :func:`mean_center` (HUGEINT radicand)."""
    return f"""
    WITH q AS (
        SELECT {class_col},
               CAST(round({x_col}) AS BIGINT) AS xi,
               CAST(round({y_col}) AS BIGINT) AS yi
        FROM ({source_sql})),
    agg AS (
        SELECT {class_col},
               CAST(count(*) AS BIGINT) AS n_pts,
               CAST(sum(xi) AS BIGINT) AS _sx,
               CAST(sum(yi) AS BIGINT) AS _sy,
               sum(CAST(xi AS HUGEINT) * xi) AS _sxx,
               sum(CAST(yi AS HUGEINT) * yi) AS _syy
        FROM q GROUP BY {class_col})
    SELECT {class_col}, n_pts,
           CAST(_sx // n_pts AS BIGINT) AS cx_m,
           CAST(_sy // n_pts AS BIGINT) AS cy_m,
           CAST(round(sqrt(CAST(CAST(n_pts AS HUGEINT) * (_sxx + _syy)
                                - CAST(_sx AS HUGEINT) * _sx
                                - CAST(_sy AS HUGEINT) * _sy AS DOUBLE))
                      / n_pts) AS BIGINT) AS std_m
    FROM agg
    """


def dilate_cells(cells: DataFrame, res: int,
                 cross_face: bool = True) -> DataFrame:
    """Morphological DILATION of a cell mask by one queen ring: the
    input cells plus every grid neighbor (cross-face correct).  One
    neighbor explode + a distinct — the raster-morphology building block
    on the lattice (masks are how cell stores encode extents, burn
    results, buffers)."""
    nbrs = cell_neighbors(cells, res, cross_face) \
        .select(F.col("nbr").alias("cellid"))
    return cells.select("cellid").unionByName(nbrs).distinct()


def erode_cells(cells: DataFrame, res: int,
                cross_face: bool = True) -> DataFrame:
    """Morphological EROSION: cells whose FULL grid neighborhood is
    present in the mask (8 neighbors; 7 at cube corners under
    cross_face=True — the neighborhood the grid actually has; with
    cross_face=False, face-edge cells use their smaller in-face
    neighborhood).  required-vs-present counts over ONE neighbor
    enumeration; erode→dilate = opening (despeckle), dilate→erode =
    closing (hole fill)."""
    pairs = cell_neighbors(cells, res, cross_face) \
        .localCheckpoint(eager=False)  # used twice (required + present);
    # eager=False: the persist dedups both uses inside the one action
    req = pairs.groupBy("cellid").agg(F.count("*").alias("_req"))
    pres = (pairs.join(cells.select(F.col("cellid").alias("nbr")), "nbr")
            .groupBy("cellid").agg(F.count("*").alias("_n")))
    return (req.join(pres, "cellid")
            .filter(F.col("_n") == F.col("_req"))
            .select("cellid"))


def erode_cells_sql(source_sql: str, res: int,
                    cross_face: bool = True) -> str:
    """DuckDB twin of erode_cells (same neighbor enumeration)."""
    nbr = cell_neighbors_sql(source_sql, res, cross_face)
    return f"""
    WITH _mp AS MATERIALIZED ({nbr}),
    _mr AS (SELECT cellid, count(*) AS _req FROM _mp GROUP BY cellid),
    _ms AS (SELECT p.cellid, count(*) AS _n
            FROM _mp p JOIN (SELECT cellid FROM ({source_sql})) c
              ON c.cellid = p.nbr
            GROUP BY p.cellid)
    SELECT r.cellid FROM _mr r JOIN _ms s USING (cellid)
    WHERE s._n = r._req
    """


def _nbr_slot_exprs(res: int, cross_face: bool) -> "list[str]":
    """SQL slot expressions enumerating every queen-neighbor POSITION of
    a lattice cell (face, row, col) as nullable structs
    (f INT, r BIGINT, c BIGINT, a INT) — a = 1 for seam-glued targets.
    The 24-row gluing table (dggs/topology.edge_table — STATIC, kernel
    derived) is compiled into 6-way CASE expressions instead of a
    broadcast join: the join form cost one driver createDataFrame + one
    BroadcastExchange per invocation (~0.3-0.4 s fixed latency each —
    measured: the 3-level kring walk spent 1.2 s of its 1.4 s in the
    three 24-row broadcasts), and the expression form is a pure
    projection the whole-stage pipeline absorbs."""
    from ..dggs.topology import edge_table_rows

    E = 3 ** res
    slots = []
    for dr, dc in _NEIGHBOR_OFFSETS:
        slots.append(
            f"IF(row + {dr} >= 0 AND row + {dr} <= {E - 1}"
            f" AND col + {dc} >= 0 AND col + {dc} <= {E - 1},"
            f" named_struct('f', face,"
            f" 'r', CAST(row + {dr} AS BIGINT),"
            f" 'c', CAST(col + {dc} AS BIGINT),"
            f" 'a', 0), NULL)")
    if not cross_face:
        return slots
    tbl = {(f, e): (f2, e2, fl)
           for f, e, f2, e2, fl in edge_table_rows()}
    edge_cond = {0: "row = 0", 1: f"col = {E - 1}",
                 2: f"row = {E - 1}", 3: "col = 0"}
    for e in range(4):
        t = "col" if e in (0, 2) else "row"
        f2c = ("CASE face " + " ".join(
            f"WHEN {f} THEN {tbl[(f, e)][0]}" for f in range(6)) + " END")
        flips = {f: tbl[(f, e)][2] for f in range(6)}
        flip_faces = [f for f, fl in flips.items() if fl == 1]
        t2 = (f"IF(face IN ({', '.join(map(str, flip_faces))}),"
              f" {E - 1} - {t}, {t})") if flip_faces else t
        e2c = ("CASE face " + " ".join(
            f"WHEN {f} THEN {tbl[(f, e)][1]}" for f in range(6)) + " END")
        for d in (-1, 0, 1):
            t3 = f"({t2} + {d})"
            row2 = (f"CASE WHEN ({e2c}) = 0 THEN 0"
                    f" WHEN ({e2c}) = 2 THEN {E - 1}"
                    f" ELSE {t3} END")
            col2 = (f"CASE WHEN ({e2c}) IN (0, 2) THEN {t3}"
                    f" WHEN ({e2c}) = 1 THEN {E - 1}"
                    f" ELSE 0 END")
            slots.append(
                f"IF(({edge_cond[e]}) AND {t3} >= 0 AND {t3} <= {E - 1},"
                f" named_struct('f', CAST({f2c} AS INT),"
                f" 'r', CAST({row2} AS BIGINT),"
                f" 'c', CAST({col2} AS BIGINT),"
                f" 'a', 1), NULL)")
    return slots


def _coord_neighbors(lat: DataFrame, res: int,
                     cross_face: bool) -> DataFrame:
    """One queen step on NUMERIC lattice coordinates: ``lat`` =
    (v, face, row, col) → every neighbor position (v, face, row, col),
    payload ``v`` carried through.  The coordinate twin of
    :func:`cell_neighbors` (same neighbor set, _nbr_slot_exprs form)
    minus the per-step cellid string build/decode — kring composes k of
    these, and string round-trips between levels made the composed plan
    explode (see kring_cells)."""
    slots = _nbr_slot_exprs(res, cross_face)
    return (lat
            .select("v", F.explode(F.expr(
                "filter(array(" + ", ".join(slots)
                + "), x -> x IS NOT NULL)")).alias("_x"))
            .select("v", F.col("_x.f").alias("face"),
                    F.col("_x.r").alias("row"),
                    F.col("_x.c").alias("col")))


def kring_cells(cells: DataFrame, res: int, k: int,
                cross_face: bool = True) -> DataFrame:
    """(cellid, nbr, ring): every grid cell within queen GRAPH distance
    ``k`` of each input cell, with ``ring`` = exact minimum hop count
    (1..k) — the H3 `grid_disk`/`k_ring` surface on the rHEALPix lattice,
    cross-face CORRECT (TODO_r7 #3; radius 1 = :func:`cell_neighbors`).

    Semantics: distance is minimum #steps in the queen adjacency graph
    (``cell_neighbors`` edges, seam-glued when ``cross_face``).  On a
    face interior this equals Chebyshev distance; across seams and at
    the 24 cube corners the planar closed form does not exist, so the
    ring index is computed by breadth-first EXPANSION — exactly k rounds
    of the radius-1 relation with an anti-join against already-reached
    cells (min-distance by construction: a cell first reached in round r
    has ring r).

    Scale shape (100 TB, r7 rewrite): the walk runs on NUMERIC lattice
    coordinates — seeds are decoded to (face, row, col) once
    (checkpointed: one eager job that also cuts the encode lineage,
    CLAUDE.md constraint 2), each of the k levels is the offsets
    explode + the O(sqrt) seam branch (broadcast 24-row gluing table)
    + a distinct over (seed, face, row, col), and the nbr cellid
    STRING is built exactly once from the min-ring aggregate at the
    end.  Level size is O(seeds·k²) after dedup, never O(seeds·9^k).
    The whole expansion is LAZY: a single min(ring) aggregate over the
    per-level walk relations replaces the old per-round anti-join +
    eager ``localCheckpoint`` (the k-round BFS issued k blocking jobs
    of tiny shuffles; min walk length = graph distance, since a walk
    of exactly r steps exists iff one of length dist does and no
    shorter walk exists below dist).  Keeping the levels numeric is
    what makes the lazy form cheap — a string-level composition
    re-inlined build→decode→build digit expressions per level and
    measured SLOWER than the BFS it replaced (plan text grew to
    ~170 KB; codegen/planning dominated these cell-table queries)."""
    if k < 1:
        raise ValueError(f"kring_cells: k must be >= 1, got {k}")
    lat0 = (with_lattice(cells.select("cellid").distinct(), res)
            .select(F.col("cellid").alias("v"), "face", "row", "col")
            .localCheckpoint(eager=False))
    # per-level dedup only for deep rings: at k <= 3 the un-deduped walk
    # cascade is <= 9^3 rows per seed feeding the final min(ring)'s
    # MAP-SIDE partial aggregate (which bounds the shuffle at
    # O(seeds·k²) regardless), and skipping the k distinct exchanges
    # measured ~25% faster warm / ~2x faster cold; from k = 4 the 9^k
    # map-side blowup wins and the distincts pay for themselves
    dedup = k >= 4
    cur = _coord_neighbors(lat0, res, cross_face)
    if dedup:
        cur = cur.distinct()
    levels = [cur.withColumn("ring", F.lit(1).cast("int"))]
    for r in range(2, k + 1):
        cur = _coord_neighbors(cur, res, cross_face)
        if dedup:
            cur = cur.distinct()
        levels.append(cur.withColumn("ring", F.lit(r).cast("int")))
    allr = levels[0]
    for lv in levels[1:]:
        allr = allr.unionByName(lv)
    best = (allr.groupBy("v", "face", "row", "col")
            .agg(F.min("ring").alias("ring")))
    return (best
            .select(F.col("v").alias("cellid"),
                    F.expr(cellid_from_rowcol_sql(res, "div"))
                    .alias("nbr"),
                    "ring")
            .filter(F.col("nbr") != F.col("cellid")))


def kring_cells_sql(source_sql: str, res: int, k: int,
                    cross_face: bool = True) -> str:
    """DuckDB twin of :func:`kring_cells`: the same k-round expansion as
    an unrolled CTE chain, every level MATERIALIZED (CLAUDE.md
    constraint 14 — un-materialized levels inline exponentially)."""
    if k < 1:
        raise ValueError(f"kring_cells_sql: k must be >= 1, got {k}")
    seeds = f"(SELECT DISTINCT cellid FROM ({source_sql}))"
    e1 = cell_neighbors_sql(seeds, res, cross_face)
    parts = [f"_e1 AS MATERIALIZED (SELECT DISTINCT cellid, nbr"
             f" FROM ({e1}))",
             "_reach1 AS MATERIALIZED (SELECT cellid, nbr,"
             " CAST(1 AS INT) AS ring FROM _e1)",
             "_front1 AS MATERIALIZED (SELECT cellid, nbr FROM _e1)"]
    for r in range(2, k + 1):
        hop = cell_neighbors_sql(
            f"(SELECT DISTINCT nbr AS cellid FROM _front{r - 1})",
            res, cross_face)
        parts.append(f"_hop{r} AS MATERIALIZED (SELECT cellid AS _mid,"
                     f" nbr FROM ({hop}))")
        parts.append(f"""_front{r} AS MATERIALIZED (
            SELECT cellid, nbr FROM (
                SELECT DISTINCT f.cellid, h.nbr
                FROM _front{r - 1} f JOIN _hop{r} h ON h._mid = f.nbr) q
            WHERE q.nbr <> q.cellid
              AND NOT EXISTS (SELECT 1 FROM _reach{r - 1} p
                              WHERE p.cellid = q.cellid
                                AND p.nbr = q.nbr))""")
        parts.append(f"""_reach{r} AS MATERIALIZED (
            SELECT cellid, nbr, ring FROM _reach{r - 1}
            UNION ALL
            SELECT cellid, nbr, CAST({r} AS INT) AS ring
            FROM _front{r})""")
    return (f"WITH {', '.join(parts)}\n"
            f"SELECT cellid, nbr, ring FROM _reach{k}")
