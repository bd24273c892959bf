from . import io, rest

__all__ = ["io", "rest"]
