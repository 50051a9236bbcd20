from . import plotting, profiling

__all__ = ["plotting", "profiling"]
