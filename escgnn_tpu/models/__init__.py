from escgnn_tpu.models.layers import (
    MaskedBatchNorm,
    MLP,
    GINEConv,
    TorchDense,
    torch_linear_kernel_init,
    torch_linear_bias_init,
)
from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
from escgnn_tpu.models.ogb_gnn import OgbGNN, OgbGNNConfig, GNNNodeEfficient
from escgnn_tpu.models.ppgn import PPGN, PPGNConfig
from escgnn_tpu.models.ngnn import NGNN, NGNNConfig
from escgnn_tpu.models.registry import get_model, register_model

register_model("NestedGIN_eff")(
    lambda **kw: NestedGINEff(NestedGINEffConfig(**kw))
)
register_model("OgbGNN")(lambda **kw: OgbGNN(OgbGNNConfig(**kw)))
register_model("PPGN")(lambda **kw: PPGN(PPGNConfig(**kw)))
register_model("PPGN_eff")(lambda **kw: PPGN(PPGNConfig(use_esc=True, **kw)))
register_model("NGNN")(lambda **kw: NGNN(NGNNConfig(**kw)))

__all__ = [
    "MaskedBatchNorm",
    "MLP",
    "GINEConv",
    "TorchDense",
    "NestedGINEff",
    "NestedGINEffConfig",
    "OgbGNN",
    "OgbGNNConfig",
    "GNNNodeEfficient",
    "PPGN",
    "PPGNConfig",
    "NGNN",
    "NGNNConfig",
    "get_model",
    "register_model",
    "torch_linear_kernel_init",
    "torch_linear_bias_init",
]
