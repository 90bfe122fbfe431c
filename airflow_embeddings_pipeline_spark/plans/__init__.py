from .catalog import QUERIES, Query, get_catalog

__all__ = ["QUERIES", "Query", "get_catalog"]
