from . import (
    conform,
    dedup,
    incremental,
    merge,
    multimodal,
    similarity,
    skew,
    text,
)

__all__ = [
    "conform",
    "dedup",
    "incremental",
    "merge",
    "multimodal",
    "similarity",
    "skew",
    "text",
]
