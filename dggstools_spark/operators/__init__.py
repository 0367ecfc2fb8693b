from . import spatial_join, auid, dedup, raster

__all__ = ["spatial_join", "auid", "dedup", "raster"]
