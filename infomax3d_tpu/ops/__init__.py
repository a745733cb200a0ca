from infomax3d_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_softmax,
    degree,
    pna_multi_aggregate,
    batch_readout,
    graph_readout,
)
from infomax3d_tpu.ops.encodings import fourier_encode_dist

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "degree",
    "pna_multi_aggregate",
    "batch_readout",
    "graph_readout",
    "fourier_encode_dist",
]
