"""Pure-numpy rHEALPix DGGS kernel (no Spark dependencies).

Reimplements, from the published equations (Gibb/Raichev/Speth 2013 "The
rHEALPix Discrete Global Grid System"; Calabretta & Roukema 2007 "Mapping on
the HEALPix grid"), the semantic contract of the reference library
dggstools/rhealpixdggs: cell encoding, cell geometry, resolution policy,
geodesy helpers and AUID algebra.  Everything is vectorized numpy so it can be
wrapped in Arrow-batched pandas UDFs on the Spark side.
"""

from .config import RHEALPixConfig, DEFAULT_CONFIG, WGS84_A, WGS84_F, AUTHALIC_RADIUS
from .cells import (
    planar_to_cellid,
    lonlat_to_cellid,
    cellid_to_planar_centroid,
    cellid_to_ul_vertex,
    cellid_to_bbox,
    cellid_to_lonlat_centroid,
)
from . import auids

__all__ = [
    "RHEALPixConfig",
    "DEFAULT_CONFIG",
    "WGS84_A",
    "WGS84_F",
    "AUTHALIC_RADIUS",
    "planar_to_cellid",
    "lonlat_to_cellid",
    "cellid_to_planar_centroid",
    "cellid_to_ul_vertex",
    "cellid_to_bbox",
    "cellid_to_lonlat_centroid",
    "auids",
]
