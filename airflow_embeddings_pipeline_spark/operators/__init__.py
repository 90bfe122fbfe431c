from .dedup import exact_dedup, latest_per_key
from .merge import merge_upsert

__all__ = ["exact_dedup", "latest_per_key", "merge_upsert"]
