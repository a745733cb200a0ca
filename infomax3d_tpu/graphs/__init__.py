from infomax3d_tpu.graphs.batch import (
    GraphBatch,
    BucketSpec,
    batch_graphs,
    complete_graph_edges,
    pick_bucket,
    make_bucket_ladder,
)

__all__ = [
    "GraphBatch",
    "BucketSpec",
    "batch_graphs",
    "complete_graph_edges",
    "pick_bucket",
    "make_bucket_ladder",
]
