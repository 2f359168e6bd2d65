from pysparkflow.operators.asof import asof_join
from pysparkflow.operators.rangejoin import range_join
from pysparkflow.operators.skew import salted_join

__all__ = ["asof_join", "range_join", "salted_join"]
