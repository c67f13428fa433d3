from .attention import attention_bnsd, flash_attention
from .norms import channel_rms_norm, gelu_tanh, layer_norm, modulate, rms_norm, t5_layer_norm
from .rope import apply_rope, rope_angles_for_grid, sinusoidal_embedding_1d

__all__ = [
    "attention_bnsd",
    "flash_attention",
    "channel_rms_norm",
    "gelu_tanh",
    "layer_norm",
    "modulate",
    "rms_norm",
    "t5_layer_norm",
    "apply_rope",
    "rope_angles_for_grid",
    "sinusoidal_embedding_1d",
]
