from escgnn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_softmax,
    masked_mean,
    gather,
)
from escgnn_tpu.ops.zemb import zemb_weighted_gather

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "masked_mean",
    "gather",
    "zemb_weighted_gather",
]
