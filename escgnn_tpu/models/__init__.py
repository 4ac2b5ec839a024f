from escgnn_tpu.models.layers import (
    MaskedBatchNorm,
    MLP,
    GINEConv,
    torch_linear_kernel_init,
    torch_linear_bias_init,
)
from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
from escgnn_tpu.models.registry import get_model, register_model

__all__ = [
    "MaskedBatchNorm",
    "MLP",
    "GINEConv",
    "NestedGINEff",
    "NestedGINEffConfig",
    "get_model",
    "register_model",
    "torch_linear_kernel_init",
    "torch_linear_bias_init",
]
