"""Pure Arrow/numpy mergeable statistic kernels (no Ray dependency).

Every accumulator obeys the protocol::

    acc.update(arrow_array)        # fold a batch's column in
    acc.merge(other)               # associative + commutative merge
    acc.finalize() -> dict         # human-readable metrics
    acc.to_state() / from_state()  # plain-picklable state for shipping

Merge-order independence is the contract (SURVEY.md §4.1 "Ordering"):
all of these are associative/commutative so Ray task placement and
retries cannot change results (exactly for counts/min/max/histogram;
within documented tolerance for t-digest/HLL).
"""

from tanml_ray.kernels.accumulators import (
    ColumnProfileAcc,
    FixedHistogram,
    NumericMoments,
)
from tanml_ray.kernels.hll import HyperLogLog
from tanml_ray.kernels.tdigest import TDigest
from tanml_ray.kernels.heavyhitters import MisraGries

__all__ = [
    "ColumnProfileAcc",
    "FixedHistogram",
    "NumericMoments",
    "HyperLogLog",
    "TDigest",
    "MisraGries",
]
