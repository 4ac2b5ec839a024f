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
from escgnn_tpu.models.baselines import (
    BaselineGNN,
    BaselineGNNConfig,
    RGCNBaseline,
    RGCNBaselineConfig,
)
from escgnn_tpu.models.idgnn import IDGNN, IDGNNConfig
from escgnn_tpu.models.gine_plus import GINEPlusConfig, GINEPlusNetwork
from escgnn_tpu.models.nested_ppgn import NestedPPGN, NestedPPGNConfig
from escgnn_tpu.models.kgnn_models import (
    KGNN,
    KGNNConfig,
    KSetGraphConv,
    NNConv,
)
from escgnn_tpu.models.registry import get_model, register_model

register_model("NestedGIN_eff")(
    lambda **kw: NestedGINEff(NestedGINEffConfig(**kw))
)
register_model("OgbGNN")(lambda **kw: OgbGNN(OgbGNNConfig(**kw)))
register_model("PPGN")(lambda **kw: PPGN(PPGNConfig(**kw)))
register_model("PPGN_eff")(lambda **kw: PPGN(PPGNConfig(use_esc=True, **kw)))
register_model("NGNN")(lambda **kw: NGNN(NGNNConfig(**kw)))
register_model("BaselineGNN")(
    lambda **kw: BaselineGNN(BaselineGNNConfig(**kw))
)
register_model("RGCN")(lambda **kw: RGCNBaseline(RGCNBaselineConfig(**kw)))
register_model("IDGNN")(lambda **kw: IDGNN(IDGNNConfig(**kw)))
register_model("GINEPlus")(
    lambda **kw: GINEPlusNetwork(GINEPlusConfig(**kw))
)
register_model("NestedPPGN")(lambda **kw: NestedPPGN(NestedPPGNConfig(**kw)))
register_model("k1_GNN")(
    lambda **kw: KGNN(KGNNConfig(levels=(), nested=False, **kw))
)
register_model("Nested_k12_GNN")(
    lambda **kw: KGNN(KGNNConfig(levels=(2,), **kw))
)
register_model("Nested_k13_GNN")(
    lambda **kw: KGNN(KGNNConfig(levels=(3,), **kw))
)
register_model("Nested_k123_GNN")(
    lambda **kw: KGNN(KGNNConfig(levels=(2, 3), **kw))
)

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
    "BaselineGNN",
    "BaselineGNNConfig",
    "RGCNBaseline",
    "RGCNBaselineConfig",
    "IDGNN",
    "IDGNNConfig",
    "GINEPlusNetwork",
    "GINEPlusConfig",
    "NestedPPGN",
    "NestedPPGNConfig",
    "KGNN",
    "KGNNConfig",
    "KSetGraphConv",
    "NNConv",
    "get_model",
    "register_model",
    "torch_linear_kernel_init",
    "torch_linear_bias_init",
]
