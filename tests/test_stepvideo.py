"""StepVideo golden parity vs the reference torch modules (DiT at tiny
config; Step1 LLM at tiny config; VAE version-2 encoder/decoder at reduced
channels; chunked decode + mix + tiled decode through a StepVideoVAE shim)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from svi_tpu.models import stepvideo as sv
from svi_tpu.models import stepvideo_vae as svae

from reference_loader import load_ref_module


def _randn_state(module, seed, scale=0.03):
    torch.manual_seed(seed)
    state = module.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * scale
    module.load_state_dict(state)
    return {k: v.clone() for k, v in state.items()}


def test_stepvideo_dit_parity():
    ref = load_ref_module("diffsynth.models.stepvideo_dit")
    model = ref.StepVideoModel(
        num_attention_heads=2, attention_head_dim=128, in_channels=8,
        out_channels=8, num_layers=2, caption_channels=[48, 24],
        attention_type="torch").eval()
    state = _randn_state(model, 0, scale=0.02)
    params = sv.stepvideo_dit_params_from_torch(state)

    torch.manual_seed(1)
    b, f, h, w = 1, 3, 4, 6
    hidden = torch.randn(b, f, 8, h, w) * 0.5
    llm = torch.randn(b, 10, 48) * 0.2
    clip = torch.randn(b, 4, 24) * 0.2
    mask = torch.ones(b, 14, dtype=torch.long)
    mask[:, 11:] = 0
    timestep = torch.tensor([0.7])
    with torch.no_grad():
        ref_out = model(hidden, encoder_hidden_states=llm,
                        encoder_hidden_states_2=clip, timestep=timestep,
                        encoder_attention_mask=mask).numpy()
    ours = np.asarray(sv.stepvideo_dit_forward(
        params, jnp.asarray(hidden.numpy()), jnp.asarray(llm.numpy()),
        jnp.asarray(mask.numpy()), jnp.asarray(timestep.numpy()),
        encoder_hidden_states_2=jnp.asarray(clip.numpy()),
        num_heads=2, head_dim=128))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=3e-3, atol=3e-3)


def test_stepvideo_rope_tables():
    ref = load_ref_module("diffsynth.models.stepvideo_dit")
    rope = ref.RoPE3D(freq=1e4, F0=1.0, scaling_factor=1.0)
    f, h, w = 3, 4, 5
    torch.manual_seed(2)
    x = torch.randn(1, f * h * w, 2, 128)
    ref_out = rope(x.clone(), [f, h, w], [64, 32, 32]).numpy()
    cos, sin = sv.prepare_stepvideo_rope(f, h, w)
    ours = np.asarray(sv._rope_apply(jnp.asarray(x.numpy()),
                                     jnp.asarray(cos), jnp.asarray(sin)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-5)


def test_step1_text_encoder_parity():
    ref = load_ref_module("diffsynth.models.stepvideo_text_encoder")
    from transformers import PretrainedConfig

    cfg = PretrainedConfig(
        hidden_size=64, num_attention_heads=4, num_attention_groups=2,
        ffn_hidden_size=256, num_layers=2, padded_vocab_size=50,
        hidden_dropout=0.0, attention_dropout=0.0, layernorm_epsilon=1e-5,
        seq_length=32, use_flash_attn=True, fp32_residual_connection=False,
        embedding_weights_in_fp32=False, params_dtype=torch.float32)
    model = ref.Step1Model(cfg).eval()
    state = _randn_state(model, 3, scale=0.05)
    params = sv.step1_params_from_torch(state)

    torch.manual_seed(4)
    ids = torch.randint(0, 50, (2, 12))
    with torch.no_grad(), pytest.warns(UserWarning):
        ref_out = model(ids).numpy()  # (S, B, D)
    ours = np.asarray(sv.step1_encode(params, jnp.asarray(ids.numpy()),
                                      num_heads=4, num_groups=2))
    np.testing.assert_allclose(ours.transpose(1, 0, 2), ref_out,
                               rtol=2e-4, atol=2e-4)


def _tiny_ref_vae():
    mod = load_ref_module("diffsynth.models.stepvideo_vae")
    mod.base_group_norm.spatial = True  # version-2 flag (ref :927)
    enc = mod.VideoEncoder(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                           z_channels=8, version=2).eval()
    dec = mod.VideoDecoder(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                           z_channels=8, out_channels=3, version=2).eval()
    enc_state = _randn_state(enc, 5, scale=0.05)
    dec_state = _randn_state(dec, 6, scale=0.05)
    state = {f"encoder.{k}": v for k, v in enc_state.items()}
    state.update({f"decoder.{k}": v for k, v in dec_state.items()})
    params = svae.stepvideo_vae_params_from_torch(state)
    return mod, enc, dec, params


def test_stepvideo_vae_encoder_parity():
    _, enc, _, params = _tiny_ref_vae()
    torch.manual_seed(7)
    video = torch.randn(1, 3, 17, 32, 32) * 0.5  # (B, C, T, H, W)
    with torch.no_grad():
        ref_lat = enc(video, 17, True).numpy()  # (B, T, C, H, W)
    ours = np.asarray(svae.stepvideo_vae_encode_chunk(
        params, jnp.asarray(video.permute(0, 2, 1, 3, 4).numpy())))
    assert ours.shape == ref_lat.shape
    np.testing.assert_allclose(ours, ref_lat, rtol=4e-3, atol=4e-3)


def test_stepvideo_vae_decoder_parity():
    _, _, dec, params = _tiny_ref_vae()
    torch.manual_seed(8)
    z = torch.randn(1, 3, 8, 2, 2) * 0.5  # (B, T, C, H, W)
    with torch.no_grad():
        ref_out = dec(z, is_init=True).numpy()  # (B, C, T, H, W)
    ours = np.asarray(svae.stepvideo_vae_decode_chunk(params,
                                                      jnp.asarray(z.numpy())))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=4e-3, atol=4e-3)


def _vae_shim(mod, enc, dec):
    vae = mod.StepVideoVAE.__new__(mod.StepVideoVAE)
    torch.nn.Module.__init__(vae)
    vae.frame_len, vae.latent_len, vae.world_size = 17, 3, 1
    vae.encoder, vae.decoder = enc, dec
    return vae


def test_stepvideo_vae_chunked_decode_and_mix_parity():
    mod, enc, dec, params = _tiny_ref_vae()
    vae = _vae_shim(mod, enc, dec)
    torch.manual_seed(9)
    z = torch.randn(1, 6, 8, 2, 2) * 0.5  # two latent chunks
    with torch.no_grad():
        ref_out = vae.decode(z, device="cpu", tiled=False).numpy()
    ours = np.asarray(svae.stepvideo_vae_decode(params, jnp.asarray(z.numpy())))
    assert ours.shape == ref_out.shape  # (B, 34, 3, H, W)
    np.testing.assert_allclose(ours, ref_out, rtol=4e-3, atol=4e-3)


def test_stepvideo_vae_tiled_decode_parity():
    mod, enc, dec, params = _tiny_ref_vae()
    vae = _vae_shim(mod, enc, dec)
    torch.manual_seed(10)
    z = torch.randn(1, 3, 8, 3, 3) * 0.5
    with torch.no_grad():
        ref_out = vae.decode(z, device="cpu", tiled=True, tile_size=(2, 2),
                             tile_stride=(1, 1)).numpy()
    ours = np.asarray(svae.stepvideo_vae_tiled_decode(
        params, jnp.asarray(z.numpy()), tile_size=(2, 2), tile_stride=(1, 1)))
    # ref tiled decode returns channel-first (B,C,T,H,W); ours normalizes
    # to (B,T,C,H,W) — compare transposed
    assert ours.shape == tuple(np.transpose(ref_out, (0, 2, 1, 3, 4)).shape)
    np.testing.assert_allclose(ours.transpose(0, 2, 1, 3, 4), ref_out,
                               rtol=4e-3, atol=4e-3)


def test_stepvideo_tokenize_framing():
    ids, mask = sv.step1_tokenize(["ab"], lambda s: [7, 8, 9], max_length=8)
    assert ids.tolist() == [[1, 7, 8, 9, 2, 2, 2, 2]]
    assert mask.tolist() == [[1, 1, 1, 1, 1, 0, 0, 0]]


def test_flow_match_stepvideo_config_golden():
    """The StepVideo scheduler config (ref step_video.py:24): sigma_min=0,
    extra_one_step, shift=13, reverse_sigmas, num_train_timesteps=1."""
    ref = load_ref_module("diffsynth.schedulers.flow_match")
    from svi_tpu.schedulers.flow_match import FlowMatchScheduler

    rs = ref.FlowMatchScheduler(sigma_min=0.0, extra_one_step=True,
                                shift=13.0, reverse_sigmas=True,
                                num_train_timesteps=1)
    rs.set_timesteps(6)
    ours = FlowMatchScheduler(sigma_min=0.0, extra_one_step=True, shift=13.0,
                              reverse_sigmas=True, num_train_timesteps=1)
    ours.set_timesteps(6)
    np.testing.assert_allclose(np.asarray(ours.sigmas), rs.sigmas.numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.timesteps),
                               rs.timesteps.numpy(), rtol=1e-6, atol=1e-6)
    torch.manual_seed(11)
    x = torch.randn(1, 3, 4)
    pred = torch.randn(1, 3, 4)
    ref_next = rs.step(pred, rs.timesteps[2], x).numpy()
    ours_next = np.asarray(ours.step(jnp.asarray(pred.numpy()),
                                     ours.timesteps[2],
                                     jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours_next, ref_next, rtol=1e-5, atol=1e-5)


def test_stepvideo_pipeline_smoke():
    """End-to-end glue at tiny config: denoise + chunked decode, both CFG
    branches, PIL frames out."""
    ref = load_ref_module("diffsynth.models.stepvideo_dit")
    model = ref.StepVideoModel(
        num_attention_heads=2, attention_head_dim=128, in_channels=8,
        out_channels=8, num_layers=2, caption_channels=[48, 24],
        attention_type="torch").eval()
    dit_params = sv.stepvideo_dit_params_from_torch(_randn_state(model, 12))
    _, _, _, vae_params = _tiny_ref_vae()

    from svi_tpu.pipelines.step_video import StepVideoPipeline

    pipe = StepVideoPipeline(dit_params, vae_params=vae_params,
                             dtype=jnp.float32)
    emb = (np.random.RandomState(0).randn(1, 4, 24).astype(np.float32),
           np.random.RandomState(1).randn(1, 10, 48).astype(np.float32),
           np.ones((1, 14), np.int32))
    frames = pipe("", seed=0, height=32, width=32, num_frames=17,
                  num_inference_steps=2, cfg_scale=9.0, tiled=False,
                  prompt_emb_posi=emb, prompt_emb_nega=emb)
    assert len(frames) == 17
    assert frames[0].size == (32, 32)
