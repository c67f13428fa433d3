"""Shared tiny-model builders for pipeline tests."""

import jax
import jax.numpy as jnp

from svi_tpu.models import clip_vision, wan_dit, wan_vae


def tiny_pipeline_models(z=4, multitalk=False, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    vae_cfg = wan_vae.WanVAEConfig(dim=16, z_dim=z, dtype=jnp.float32)
    vae_params = wan_vae.init_params(k1, vae_cfg)
    dit_cfg = wan_dit.WanDiTConfig(
        dim=64, in_dim=z + 4 + z, ffn_dim=128, out_dim=z, text_dim=48, freq_dim=32,
        num_heads=2, num_layers=2, has_image_input=True, dtype=jnp.float32,
        clip_feature_dim=40, enable_multitalk=multitalk,
    )
    dit_params = wan_dit.init_params(k2, dit_cfg)
    clip_cfg = clip_vision.ClipVisionConfig(
        image_size=28, patch_size=14, dim=40, mlp_ratio=2, num_heads=2, num_layers=2,
        dtype=jnp.float32,
    )
    clip_params = clip_vision.init_params(k3, clip_cfg)
    return (dit_params, dit_cfg), (vae_params, vae_cfg), (clip_params, clip_cfg)
