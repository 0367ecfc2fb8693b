from . import lineage

__all__ = ["lineage"]
