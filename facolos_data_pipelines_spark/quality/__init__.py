from .checks import (
    table_stats,
    multi_table_summary,
    flatten_invariants,
    validate_pre_load,
    validate_post_load,
    quality_gate,
)

__all__ = [
    "table_stats",
    "multi_table_summary",
    "flatten_invariants",
    "validate_pre_load",
    "validate_post_load",
    "quality_gate",
]
