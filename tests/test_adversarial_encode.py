"""Adversarial cross-engine encode fuzz (no Spark needed, runs in ~1 s):
the numpy kernel and the portable-SQL formula (evaluated by DuckDB) must
assign identical cellids for points deliberately placed near every seam —
cap/equator transition latitude, the poles, the antimeridian, face edges,
and epsilon-offset cell boundaries.  Margins are 1e-7 deg (~1 cm), ~9
orders of magnitude above double noise, so any disagreement is a real
formula divergence, not a float tie."""

import duckdb
import numpy as np
import pytest

from dggstools_spark.dggs import cells as kcells
from dggstools_spark.functions import encode_sql

EPS = 1e-7  # degrees


def _duckdb_encode(lon: np.ndarray, lat: np.ndarray, res: int) -> list[str]:
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (i BIGINT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)",
                    [(i, float(lo), float(la))
                     for i, (lo, la) in enumerate(zip(lon, lat))])
    sql = encode_sql.duckdb_encode_select("pts", "lon", "lat", res, ["i"])
    rows = con.execute(f"SELECT i, cellid FROM ({sql}) ORDER BY i").fetchall()
    return [r[1] for r in rows]


def _adversarial_points(rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    lons, lats = [], []
    # cap/equator transition latitude (sin(beta) = 2/3 boundary, ~41.87 deg)
    from dggstools_spark.dggs.projection import authalic_lat, geodetic_lat

    beta_edge = np.degrees(np.arcsin(2.0 / 3.0))
    phi_edge = float(np.degrees(geodetic_lat(np.radians(beta_edge))))
    for dlat in (-1e-3, -EPS, EPS, 1e-3):
        for lon in np.linspace(-179.5, 179.5, 25):
            lons.append(lon)
            lats.append(phi_edge + dlat)
            lons.append(lon)
            lats.append(-(phi_edge + dlat))
    # near the poles
    for lat in (89.0, 89.9, 89.999, -89.0, -89.9, -89.999):
        for lon in np.linspace(-179.5, 179.5, 17):
            lons.append(lon)
            lats.append(lat)
    # antimeridian / face-edge longitudes, epsilon both sides
    for lon0 in (-180.0, -90.0, 0.0, 90.0, 180.0):
        for dl in (-1e-3, -EPS, EPS, 1e-3):
            lon = lon0 + dl
            if lon < -180:
                lon += 360.0
            if lon > 180:
                lon -= 360.0
            for lat in np.linspace(-85, 85, 13):
                lons.append(lon)
                lats.append(lat)
    # epsilon off random res-5 cell boundaries: snap random points to the
    # planar lattice and jitter +-EPS around the inverse-projected corner
    from dggstools_spark.dggs.cells import HALF_SIDE
    from dggstools_spark.dggs.projection import inverse

    w = HALF_SIDE / 3**5
    gx = (rng.integers(-2 * 3**5, 2 * 3**5, 200) * w).astype(np.float64)
    gy = (rng.integers(-3**5 // 2, 3**5 // 2, 200) * w).astype(np.float64)
    lon_c, lat_c = inverse(gx, gy)
    for lo, la in zip(lon_c, lat_c):
        if not np.isfinite(lo) or not np.isfinite(la):
            continue
        for dlo, dla in ((-EPS, -EPS), (EPS, EPS), (-EPS, EPS), (EPS, -EPS)):
            lons.append(float(np.clip(lo + dlo, -180 + EPS, 180 - EPS)))
            lats.append(float(np.clip(la + dla, -90 + EPS, 90 - EPS)))
    return np.asarray(lons), np.asarray(lats)


@pytest.mark.parametrize("res", [1, 3, 5])
def test_kernel_matches_duckdb_formula_on_seams(res):
    rng = np.random.default_rng(42)
    lon, lat = _adversarial_points(rng)
    want = kcells.lonlat_to_cellid(lon, lat, res)
    got = _duckdb_encode(lon, lat, res)
    bad = [(float(lon[i]), float(lat[i]), want[i], got[i])
           for i in range(len(got)) if want[i] != got[i]]
    assert not bad, f"{len(bad)} seam disagreements, first 5: {bad[:5]}"
