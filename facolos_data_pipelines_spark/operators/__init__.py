from . import (
    conform,
    dedup,
    events,
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
    "events",
    "incremental",
    "merge",
    "multimodal",
    "sampling",
    "similarity",
    "skew",
    "text",
]
