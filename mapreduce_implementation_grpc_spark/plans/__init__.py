from . import analytics, pipeline

__all__ = ["analytics", "pipeline"]
