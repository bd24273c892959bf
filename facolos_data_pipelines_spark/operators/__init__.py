from . import conform, dedup, incremental, merge, multimodal, similarity, text

__all__ = ["conform", "dedup", "incremental", "merge", "multimodal", "similarity", "text"]
