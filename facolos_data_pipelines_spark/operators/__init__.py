from . import (
    conform,
    dedup,
    incremental,
    merge,
    multimodal,
    sampling,
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
    "sampling",
    "similarity",
    "skew",
    "text",
]
