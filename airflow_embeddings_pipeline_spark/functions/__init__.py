from .scalar import (
    ACCENT_FOLD_DST,
    ACCENT_FOLD_SRC,
    derive_display_name,
    derive_main_refco,
    first_country,
    iso_to_timestamp,
    normalize_ref,
    normalize_ref_sql,
    normalize_ref_udf,
    timestamp_to_iso,
    truncate_ref,
)

__all__ = [
    "ACCENT_FOLD_DST",
    "ACCENT_FOLD_SRC",
    "derive_display_name",
    "derive_main_refco",
    "first_country",
    "iso_to_timestamp",
    "normalize_ref",
    "normalize_ref_sql",
    "normalize_ref_udf",
    "timestamp_to_iso",
    "truncate_ref",
]
