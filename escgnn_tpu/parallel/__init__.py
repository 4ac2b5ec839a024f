from escgnn_tpu.parallel.mesh import make_mesh, stack_batches, replicate
from escgnn_tpu.parallel.data_parallel import make_dp_train_step

__all__ = ["make_mesh", "stack_batches", "replicate", "make_dp_train_step"]
