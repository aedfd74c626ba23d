from .asof import asof_join, latest_per_key

__all__ = ["asof_join", "latest_per_key"]
