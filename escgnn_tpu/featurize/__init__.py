from escgnn_tpu.featurize.layout import EncodingLayout
from escgnn_tpu.featurize.escgnn import esc_encode, EscConfig
from escgnn_tpu.featurize.transform import esc_transform

__all__ = ["EncodingLayout", "esc_encode", "EscConfig", "esc_transform"]
