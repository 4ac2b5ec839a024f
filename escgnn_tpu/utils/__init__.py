from escgnn_tpu.utils.env import setup_jax

__all__ = ["setup_jax"]
