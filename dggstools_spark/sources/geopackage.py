"""GeoPackage sink/source for cell tables — stdlib only (sqlite3 + struct).

Spark-native twin of the reference's GeoPackage path
(utils/storage.py:32-68 ``geodataframe_to_geopackage`` writes the
GeoDataFrame via GDAL and hand-inserts the attrs JSON into
``gpkg_metadata``; :86-125 reads it back).  Here the cell table itself is
written: one feature row per cell with a GPKG-binary POINT geometry at the
cell's planar centroid (the reference's geometry choice,
rhpx_gdf_helper.py:111), the cellid, and the band columns; gdf.attrs ride
in ``gpkg_metadata`` exactly like the reference (same extension rows, same
``md_standard_uri``), so its ``get_gpkg_rhpx_metadata`` would read ours.

GeoPackage is a SINGLE-FILE SQLite exchange format, not a big-data sink —
the write collects to the driver (the reference materializes a full
GeoDataFrame too).  ``max_rows`` guards against accidentally exporting a
web-scale table; the scale path remains the partitioned parquet/Iceberg
layout of cells_io.
"""

from __future__ import annotations

import json
import os
import sqlite3
import struct
import tempfile

from pyspark.sql import DataFrame, SparkSession

GPKG_APPLICATION_ID = 0x47504B47  # "GPKG"
SRS_ID = 0  # undefined cartesian; the real CRS rides in the attrs JSON
MD_STANDARD_URI = "http://www.iaaa.es/geo2dggs/spec/1"


def _gpkg_point_blob(x: float, y: float) -> bytes:
    """GeoPackageBinary header (magic GP, version 0, flags: LE, no
    envelope) + WKB POINT."""
    header = b"GP" + bytes([0, 0x01]) + struct.pack("<i", SRS_ID)
    wkb = struct.pack("<BIdd", 1, 1, x, y)
    return header + wkb


def _gpkg_polygon_blob(ring) -> bytes:
    """GeoPackageBinary + WKB POLYGON from an open 4-vertex planar ring
    (closed on write)."""
    header = b"GP" + bytes([0, 0x01]) + struct.pack("<i", SRS_ID)
    pts = list(ring) + [ring[0]]
    wkb = (struct.pack("<BII", 1, 3, 1) + struct.pack("<I", len(pts))
           + b"".join(struct.pack("<dd", float(x), float(y)) for x, y in pts))
    return header + wkb


def write_cells_geopackage(cells: DataFrame, path: str, attrs: dict,
                           layer: str = "data", cellid_col: str = "cellid",
                           max_rows: int = 5_000_000,
                           geometry: str = "point") -> int:
    """Cell table -> GeoPackage file; returns the feature count.  Band
    columns are taken as every non-cellid column (REAL affinity).
    ``geometry``: 'point' = planar centroid (reference parity,
    rhpx_gdf_helper.py:111); 'polygon' = the cell's planar boundary ring
    (dggs/cells.cellid_to_vertices).

    Rows stream through ``toLocalIterator()`` in fixed-size chunks, so
    driver memory is bounded by one Spark partition + one chunk regardless
    of ``max_rows`` (a full ``collect()`` would materialize the cap).
    The file is built at a temp path and renamed over ``path`` only on
    success, so a failed export (max_rows exceeded, mid-stream error)
    leaves any pre-existing file at ``path`` untouched."""
    from ..dggs import cells as cells_kernel

    if geometry not in ("point", "polygon"):
        raise ValueError(f"unknown geometry {geometry!r}")
    band_cols = [c for c in cells.columns if c != cellid_col]

    def _chunk_rows(chunk):
        """(blobs, rows) for one buffered chunk — kernel calls stay
        vectorized over the chunk."""
        cellids = [r[cellid_col] for r in chunk]
        cx, cy = cells_kernel.cellid_to_planar_centroid(cellids)
        if geometry == "polygon":
            verts = cells_kernel.cellid_to_vertices(cellids)
            blobs = [_gpkg_polygon_blob(verts[i]) for i in range(len(cellids))]
        else:
            blobs = [_gpkg_point_blob(float(cx[i]), float(cy[i]))
                     for i in range(len(cellids))]
        return blobs, cx, cy

    # unique temp name (tempfile.mkstemp) in the TARGET directory so the
    # final os.replace stays same-filesystem-atomic AND two concurrent
    # exports to the same path can't clobber each other's in-progress tmp
    # (a fixed path+'.tmp' would let the second writer remove the first's)
    fd, tmp = tempfile.mkstemp(
        prefix=os.path.basename(path) + ".", suffix=".tmp",
        dir=os.path.dirname(os.path.abspath(path)))
    os.close(fd)
    con = sqlite3.connect(tmp)
    try:
        n = _write_gpkg(con, cells, attrs, layer, cellid_col, max_rows,
                        band_cols, geometry, _chunk_rows)
    except Exception:
        con.close()
        try:
            os.remove(tmp)
        except FileNotFoundError:
            pass
        raise
    con.close()
    os.replace(tmp, path)
    return n


#: rows buffered per executemany/kernel batch in write_cells_geopackage
#: (module-level so tests can shrink it to exercise multi-chunk writes)
GPKG_CHUNK = 8192


def _write_gpkg(con, cells, attrs, layer, cellid_col, max_rows,
                band_cols, geometry, _chunk_rows) -> int:
    _CHUNK = GPKG_CHUNK
    with con:
        con.execute(f"PRAGMA application_id = {GPKG_APPLICATION_ID}")
        con.execute("PRAGMA user_version = 10200")  # GeoPackage 1.2
        con.execute("""CREATE TABLE gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
            definition TEXT NOT NULL, description TEXT)""")
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?, ?, ?, ?, ?, ?)",
            [("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
             ("Undefined geographic SRS", 0, "NONE", 0, "undefined",
              "rHEALPix planar CRS carried in gpkg_metadata attrs"),
             ("WGS 84", 4326, "EPSG", 4326, "GEOGCS[\"WGS 84\"]", None)])
        con.execute("""CREATE TABLE gpkg_contents (
            table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
            identifier TEXT UNIQUE, description TEXT DEFAULT '',
            last_change DATETIME NOT NULL DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
            min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
            srs_id INTEGER)""")
        con.execute("""CREATE TABLE gpkg_geometry_columns (
            table_name TEXT NOT NULL, column_name TEXT NOT NULL,
            geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
            z TINYINT NOT NULL, m TINYINT NOT NULL,
            CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")
        bands_ddl = "".join(f', "{c}" REAL' for c in band_cols)
        con.execute(f"""CREATE TABLE "{layer}" (
            fid INTEGER PRIMARY KEY AUTOINCREMENT,
            geom BLOB, "{cellid_col}" TEXT{bands_ddl})""")
        ph = ", ".join("?" * (2 + len(band_cols)))
        ins = (f'INSERT INTO "{layer}" (geom, "{cellid_col}"'
               + "".join(f', "{c}"' for c in band_cols) + f") VALUES ({ph})")
        ext = [None, None, None, None]
        n_rows = 0
        buf: list = []

        def _flush():
            nonlocal ext
            blobs, cx, cy = _chunk_rows(buf)
            if ext[0] is None:
                ext = [min(cx), min(cy), max(cx), max(cy)]
            else:
                ext = [min(ext[0], min(cx)), min(ext[1], min(cy)),
                       max(ext[2], max(cx)), max(ext[3], max(cy))]
            con.executemany(ins, [
                (blobs[i], buf[i][cellid_col], *[buf[i][c] for c in band_cols])
                for i in range(len(buf))])
            buf.clear()

        for row in cells.toLocalIterator():
            buf.append(row)
            n_rows += 1
            if n_rows > max_rows:
                raise ValueError(
                    f"cell table exceeds max_rows={max_rows}; GeoPackage is "
                    f"a single-file exchange format — use "
                    f"cells_io.write_cells for web-scale tables")
            if len(buf) >= _CHUNK:
                _flush()
        if buf:
            _flush()
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
            " min_x, min_y, max_x, max_y, srs_id) VALUES (?, 'features', ?,"
            " ?, ?, ?, ?, ?)", (layer, layer, *ext, SRS_ID))
        con.execute("INSERT INTO gpkg_geometry_columns VALUES (?, 'geom',"
                    " ?, ?, 0, 0)",
                    (layer, geometry.upper(), SRS_ID))
        # attrs metadata — same extension + metadata rows as the reference
        # (storage.py:51-66), so get_gpkg_rhpx_metadata reads ours verbatim
        con.execute("""CREATE TABLE gpkg_extensions (
            table_name TEXT, column_name TEXT, extension_name TEXT NOT NULL,
            definition TEXT NOT NULL, scope TEXT NOT NULL)""")
        for t in ("gpkg_metadata", "gpkg_metadata_reference"):
            con.execute(
                "INSERT INTO gpkg_extensions (table_name, extension_name,"
                " definition, scope) VALUES (?, 'gpkg_metadata',"
                " 'http://www.geopackage.org/spec120/#extension_metadata',"
                " 'read-write')", (t,))
        con.execute("""CREATE TABLE gpkg_metadata (
            id INTEGER PRIMARY KEY AUTOINCREMENT,
            md_scope TEXT NOT NULL DEFAULT 'dataset',
            md_standard_uri TEXT NOT NULL,
            mime_type TEXT NOT NULL DEFAULT 'text/xml',
            metadata TEXT NOT NULL DEFAULT '')""")
        con.execute(
            "INSERT INTO gpkg_metadata (id, md_scope, md_standard_uri,"
            " mime_type, metadata) VALUES (1, 'dataset', ?,"
            " 'application/json', ?)", (MD_STANDARD_URI, json.dumps(attrs)))
    return n_rows


def read_cells_geopackage(spark: SparkSession, path: str,
                          layer: str = "data",
                          cellid_col: str = "cellid") -> tuple[DataFrame, dict]:
    """GeoPackage -> (cells DataFrame, attrs dict) — the
    ``geopackage_to_rhealpix`` direction (storage.py:86-99): cellids + band
    values come from the feature table (geometry is derivable from the
    cellid, so the blob is not parsed), attrs from gpkg_metadata."""
    con = sqlite3.connect(path)
    cur = con.cursor()
    cols = [r[1] for r in cur.execute(f'PRAGMA table_info("{layer}")')]
    band_cols = [c for c in cols if c not in ("fid", "geom", cellid_col)]
    sel = ", ".join(f'"{c}"' for c in [cellid_col, *band_cols])
    rows = cur.execute(f'SELECT {sel} FROM "{layer}"').fetchall()
    attrs = json.loads(
        cur.execute("SELECT metadata FROM gpkg_metadata WHERE id = 1")
        .fetchone()[0])
    con.close()
    schema = f"{cellid_col} string" + "".join(f", {c} double" for c in band_cols)
    return spark.createDataFrame(rows, schema), attrs
