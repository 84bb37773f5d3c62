from .bucketing import write_bucketed
from .skew import salted_agg

__all__ = ["salted_agg", "write_bucketed"]
