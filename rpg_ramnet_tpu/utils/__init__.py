from .platform import ensure_platform

__all__ = ["ensure_platform"]
