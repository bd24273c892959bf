from . import (
    conform,
    dedup,
    events,
    incremental,
    linkage,
    merge,
    multimodal,
    quality_model,
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
    "linkage",
    "merge",
    "multimodal",
    "quality_model",
    "sampling",
    "similarity",
    "skew",
    "text",
]
