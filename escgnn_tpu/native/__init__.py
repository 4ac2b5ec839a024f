from escgnn_tpu.native.kgnn import (
    kgnn_set_graph,
    kgnn_assignment_2to3,
    KgnnResult,
)

__all__ = ["kgnn_set_graph", "kgnn_assignment_2to3", "KgnnResult"]
