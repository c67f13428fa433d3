"""Error-Recycling LoRA trainer (behavioral ref: train_svi.py:627-1304).

Split of responsibilities, TPU-first:
  * the TRAIN STEP is one jitted pure function: forward (bf16, remat over the
    scanned blocks) + weighted-MSE loss + AdamW-with-clipping update of the
    fp32 LoRA adapters + one-step bidirectional error extraction (pure
    flow-match algebra, ref :1151-1160) — all on device;
  * ERROR BUFFERS and the injection probability logic live on host
    (error_recycling.ErrorBuffers), exactly like the reference keeps buffers
    on CPU (:779);
  * data parallelism: batch entries shard over the mesh's 'data' axis, LoRA
    params and optimizer state are replicated; gradient averaging is the
    mean-over-batch loss (XLA inserts the psum). Buffer warmup "all-gather
    across GPUs" (ref :1163-1174) becomes: read the full (sharded) error batch
    back to host and bank every entry.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import wan_dit
from ..schedulers import flow_match as fm
from . import lora as lora_mod
from .error_recycling import ErrorBuffers


@dataclasses.dataclass
class TrainerConfig:
    # optimization (train_svi.py defaults / scripts/train/svi_shot.sh)
    learning_rate: float = 1e-4
    weight_decay: float = 1e-2
    gradient_clip_val: float = 1.0
    lora_rank: int = 128
    lora_alpha: float = 128.0
    lora_targets: tuple = lora_mod.DEFAULT_TARGETS
    use_gradient_checkpointing: bool = True
    # blocks per outer checkpoint group (sqrt-remat): 1 = per-block remat
    # (fastest, most memory), 0 = auto (divisor of num_layers nearest
    # sqrt(L)), n>1 = explicit group size. Cuts AD-saved block carries from
    # L to L/n + n — what fits 14B LoRA training on a single chip.
    remat_granularity: int = 1
    # save each block's flash-attention out/lse at forward time so the
    # backward's block recompute skips the O(S^2) kernel (see
    # wan_dit.forward_blocks). Costs (S x dim) bf16 per block of activation
    # memory: right for <=1.3B configs, too much for 14B on one chip.
    save_attention_activations: bool = False
    # host-offloaded block carries: the TPU analog of the reference's
    # torch.utils.checkpoint(..., save_on_cpu) path
    # (wan_video_dit.py:547-561) — block input carries are SAVED to
    # pinned_host instead of rematerialized, trading D2H/H2D DMA for
    # near-zero activation HBM across the block stack.
    use_gradient_checkpointing_offload: bool = False
    # ZeRO-1 analog (ref train_svi.py:156-161 deepspeed_stage_2): shard
    # optimizer moments over the mesh's 'data' axis. Only meaningful with a
    # mesh; immaterial for rank-128 LoRA but load-bearing for customtalk
    # (per-block FFNs) and full-finetune variants.
    shard_optimizer_state: bool = False
    # error recycling (ref :684-712)
    use_error_recycling: bool = True
    error_buffer_k: int = 500
    buffer_replacement_strategy: str = "random"
    buffer_warmup_iter: int = 50
    num_grids: int = 40
    error_modulate_factor: float = 0.2
    noise_prob: float = 0.99
    y_prob: float = 0.99
    latent_prob: float = 0.99
    clean_prob: float = 0.1
    clean_buffer_update_prob: float = 0.5
    y_error_num: int = 1
    use_last_y_error: bool = False
    y_error_sample_from_all_grids: bool = False
    y_error_sample_range: Optional[tuple[int, int]] = None
    num_train_timesteps: int = 1000
    sigma_shift: float = 5.0
    seed: int = 0
    # variants
    train_architecture: str = "lora"  # lora | customtalk (ref train_svi.py:659-676)
    train_pose: bool = False          # SVI-Dance: trainable dwpose_embedding
    pose_drop_prob1: float = 0.05     # train_svi_dance.py:1045-1048
    pose_drop_prob2: float = 0.1
    cond_drop_prob: float = 0.1       # clip_feature/y dropout (dance :1055-1062)
    audio_drop_prob: float = 0.1      # train_svi_talk.py:969-973


def make_optimizer(cfg: TrainerConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val),
        optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay),
    )


def _data_partition_spec(shape, n_data: int):
    """PartitionSpec sharding the largest n_data-divisible axis over 'data'
    (replicated when no axis divides). The ZeRO-1 layout rule: moments and
    other per-param optimizer leaves split across the data axis."""
    from jax.sharding import PartitionSpec as P

    best, best_dim = -1, 0
    for i, d in enumerate(shape):
        if d >= n_data and d % n_data == 0 and d > best_dim:
            best, best_dim = i, d
    parts = [None] * len(shape)
    if best >= 0:
        parts[best] = "data"
    return P(*parts)


def shard_optimizer_state(opt_state, mesh):
    """ZeRO-1 analog of the reference's deepspeed_stage_2 (train_svi.py
    :156-161): place each optimizer-state leaf sharded over the mesh's 'data'
    axis (largest divisible dim). Adapters stay replicated; the jitted train
    step keeps the moments sharded (grads are replicated by the mean loss, the
    Adam update partitions elementwise, XLA all-gathers only the small
    updates for apply_updates)."""
    from jax.sharding import NamedSharding

    n = mesh.shape["data"]
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, _data_partition_spec(jnp.shape(x), n))
        ),
        opt_state,
    )


def split_customtalk_params(base_params):
    """Extract the trainable customtalk subtrees (names containing
    'customtalk' — ref train_svi.py:670-676 requires_grad selection)."""
    blocks = base_params["blocks"]
    return {
        "customtalk_context_pre_ffns": blocks["customtalk_context_pre_ffns"],
        "customtalk_audio_pre_ffns": blocks["customtalk_audio_pre_ffns"],
    }


def merge_customtalk_params(base_params, ct):
    blocks = dict(base_params["blocks"])
    blocks.update(ct)
    out = dict(base_params)
    out["blocks"] = blocks
    return out


def make_train_step(dit_cfg, schedule, optimizer, lora_scale: float, use_remat=True,
                    mesh=None, train_pose: bool = False, train_customtalk: bool = False,
                    remat_granularity: int = 1, save_attention: bool = False,
                    offload_carries: bool = False, shard_optimizer: bool = False):
    """Returns jitted train_step(lora, opt_state, base_params, batch) ->
    (lora, opt_state, metrics dict with loss/noise_error/y_error).

    batch: dict of device arrays —
      latents (b,16,f,h,w), noise_w_error (same), latents_w_error (same),
      timestep (b,), timestep_id (b,) int32 into the training schedule,
      context (b,L,4096), clip_feature (b,257,1280) | None, y (b,20,f,h,w) | None.

    With `mesh` (axes 'data','sp'): batch entries shard over 'data', the DiT
    forward runs sequence-parallel over 'sp' (parallel.sequence_parallel), and
    gradient averaging across data shards falls out of the mean loss.
    """
    if getattr(dit_cfg, "attention_quant", "none") != "none":
        # the quantized flash forward saves the lse of the CENTERED logits
        # (ops/attention.py), so the backward's reconstructed probabilities —
        # and every gradient — would be silently wrong. Inference-only.
        raise ValueError(
            "attention_quant is inference-only: the quantized forward's saved "
            "lse is incompatible with the flash backward. Train with "
            "attention_quant='none'."
        )

    if remat_granularity == 0:
        remat_granularity = wan_dit.pick_remat_group(dit_cfg.num_layers)

    def _forward(base_params, noisy, timestep, context, clip_feature, y, lora,
                 add_condition=None, audio_embed_tuple=None):
        if mesh is not None:
            from ..parallel.sequence_parallel import forward_sp

            return forward_sp(
                base_params, dit_cfg, noisy, timestep, context,
                clip_feature=clip_feature, y=y, add_condition=add_condition,
                mesh=mesh, lora=lora, lora_scale=lora_scale, use_remat=use_remat,
                audio_embed_tuple=audio_embed_tuple,
                remat_granularity=remat_granularity,
                save_attention=save_attention,
                offload_carries=offload_carries,
            )
        return wan_dit.forward(
            base_params, dit_cfg, noisy, timestep, context,
            clip_feature=clip_feature, y=y, add_condition=add_condition,
            use_remat=use_remat, lora=lora, lora_scale=lora_scale,
            audio_embed_tuple=audio_embed_tuple,
            remat_granularity=remat_granularity,
            save_attention=save_attention,
            offload_carries=offload_carries,
        )

    def loss_fn(trainable, base_params, batch):
        lora = trainable.get("lora")
        if train_customtalk:
            base_params = merge_customtalk_params(base_params, trainable["customtalk"])
        tid = batch["timestep_id"]
        sigma = schedule.sigmas[tid][:, None, None, None, None]
        noisy = (1 - sigma) * batch["latents_w_error"].astype(jnp.float32) + sigma * batch[
            "noise_w_error"
        ].astype(jnp.float32)
        # self-corrected velocity target: noise_w_error - CLEAN latents (ref :1139)
        target = batch["noise_w_error"].astype(jnp.float32) - batch["latents"].astype(jnp.float32)
        add_condition = None
        if train_pose and batch.get("pose") is not None:
            from ..models import pose_embedding

            # embed pose with TRAINABLE conv stack; pose_keep gates the
            # post-embedding dropout (train_svi_dance.py:1045-1048 zeroes the
            # embedded condition, not the raw pose)
            cond = pose_embedding.forward(trainable["pose"], batch["pose"])
            add_condition = cond.astype(dit_cfg.dtype) * batch["pose_keep"].astype(dit_cfg.dtype)
        audio_tuple = None
        if batch.get("audio_first") is not None:
            audio_tuple = (batch["audio_first"], batch["audio_vf"])
        pred = _forward(
            base_params, noisy.astype(dit_cfg.dtype), batch["timestep"],
            batch["context"], batch.get("clip_feature"), batch.get("y"), lora,
            add_condition=add_condition, audio_embed_tuple=audio_tuple,
        )
        weight = schedule.training_weights[tid]
        loss = jnp.mean(
            jnp.mean((pred.astype(jnp.float32) - target) ** 2, axis=(1, 2, 3, 4)) * weight
        )
        return loss, (pred.astype(jnp.float32), target, noisy)

    def train_step(trainable, opt_state, base_params, batch):
        (loss, (pred, target, noisy)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, base_params, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        if mesh is not None and shard_optimizer:
            # ZeRO-1: pin the new moments to the sharded layout so XLA
            # partitions the Adam update across 'data' instead of
            # all-gathering the state back
            from jax.sharding import NamedSharding

            n_data = mesh.shape["data"]
            opt_state = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, _data_partition_spec(jnp.shape(x), n_data))
                ),
                opt_state,
            )
        trainable = optax.apply_updates(trainable, updates)

        # one-step bidirectional error extraction (ref :1151-1160):
        #   x0_pred = step(pred, t, noisy, to_final, self_corr=True)  -> sigma'=1
        #   noise_error = x0_pred - step(target, ...)
        #   x1_pred = step(pred, t, noisy, to_final, self_corr=False) -> sigma'=0
        #   y_error = x1_pred - step(target, ...)
        tid = batch["timestep_id"]
        sigma = schedule.sigmas[tid][:, None, None, None, None]
        diff = pred - target
        noise_error = diff * (1.0 - sigma)
        y_error = diff * (0.0 - sigma)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "noise_error": noise_error,
            "y_error": y_error,
        }
        return trainable, opt_state, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data"))  # prefix: axis 0 of every leaf
        rep = NamedSharding(mesh, P())
        # with shard_optimizer, opt_state arrives pre-sharded (see
        # shard_optimizer_state); None = infer sharding from the argument
        opt_in = None if shard_optimizer else rep
        return jax.jit(
            train_step,
            in_shardings=(rep, opt_in, rep, data),
            donate_argnums=(0, 1),
        )
    return jax.jit(train_step, donate_argnums=(0, 1))


class ErrorRecyclingTrainer:
    """Host-side orchestration of one training run (ref training_step :989-1199)."""

    def __init__(self, base_params, dit_cfg, config: TrainerConfig | None = None, mesh=None):
        self.cfg = config or TrainerConfig()
        self.dit_cfg = dit_cfg
        self.base_params = base_params
        self.mesh = mesh
        self.rng = random.Random(self.cfg.seed)

        self.schedule = fm.make_schedule(
            self.cfg.num_train_timesteps, shift=self.cfg.sigma_shift, sigma_min=0.0,
            extra_one_step=True, training=True,
        )
        key = jax.random.PRNGKey(self.cfg.seed)
        if self.cfg.train_architecture == "customtalk":
            assert dit_cfg.enable_customtalk, "customtalk training needs a customtalk DiT"
            self.trainable = {"customtalk": split_customtalk_params(base_params)}
        else:
            lora = lora_mod.init_lora_params(
                key, dit_cfg, rank=self.cfg.lora_rank, targets=self.cfg.lora_targets
            )
            self.trainable = {"lora": lora}
        if self.cfg.train_pose:
            from ..models import pose_embedding

            self.trainable["pose"] = pose_embedding.init_params(
                jax.random.PRNGKey(self.cfg.seed + 1), dit_cfg.dim
            )
        self.lora_scale = lora_mod.lora_scale(self.cfg.lora_rank, self.cfg.lora_alpha)
        self.optimizer = make_optimizer(self.cfg)
        self.opt_state = self.optimizer.init(self.trainable)
        if mesh is not None and self.cfg.shard_optimizer_state:
            self.opt_state = shard_optimizer_state(self.opt_state, mesh)
        self.buffers = ErrorBuffers(
            num_grids=self.cfg.num_grids,
            buffer_size=self.cfg.error_buffer_k,
            replacement_strategy=self.cfg.buffer_replacement_strategy,
            error_modulate_factor=self.cfg.error_modulate_factor,
            shift=self.cfg.sigma_shift,
            y_error_sample_from_all_grids=self.cfg.y_error_sample_from_all_grids,
            y_error_sample_range=self.cfg.y_error_sample_range,
            rng=self.rng,
        )
        self.iteration_count = 0
        self._step_fn = make_train_step(
            dit_cfg, self.schedule, self.optimizer, self.lora_scale,
            use_remat=self.cfg.use_gradient_checkpointing, mesh=mesh,
            train_pose=self.cfg.train_pose,
            train_customtalk=self.cfg.train_architecture == "customtalk",
            remat_granularity=self.cfg.remat_granularity,
            save_attention=self.cfg.save_attention_activations,
            offload_carries=self.cfg.use_gradient_checkpointing_offload,
            shard_optimizer=self.cfg.shard_optimizer_state,
        )

    @property
    def lora(self):
        return self.trainable.get("lora")

    @lora.setter
    def lora(self, value):
        self.trainable["lora"] = value

    @property
    def pose_params(self):
        return self.trainable.get("pose")

    # -- input corruption (host side, ref :1052-1135) ------------------------

    def sample_timestep(self):
        tid = self.rng.randint(0, self.cfg.num_train_timesteps - 1)
        return tid, float(self.schedule.timesteps[tid])

    def corrupt_inputs(self, latents: np.ndarray, y: Optional[np.ndarray], timestep: float):
        """Apply error injection with the reference's probability structure.
        Returns (noise_w_error, latents_w_error, y, used_clean_input)."""
        c = self.cfg
        noise = np.random.default_rng(self.rng.randint(0, 2**31 - 1)).standard_normal(
            latents.shape
        ).astype(np.float32)

        add_noise_err = self.rng.random() < c.noise_prob
        add_y_err = self.rng.random() < c.y_prob
        add_latent_err = self.rng.random() < c.latent_prob
        use_clean = self.rng.random() < c.clean_prob
        if use_clean:
            add_noise_err = add_y_err = add_latent_err = False

        noise_w_error = noise
        latents_w_error = latents
        if add_noise_err and self.buffers.has_latent_data(timestep):
            noise_w_error = noise + self.buffers.sample_noise_error(latents.shape, timestep)
        if add_y_err and y is not None and self.buffers.has_y_data(timestep):
            err = self.buffers.sample_y_error(latents.shape, timestep)
            max_start = max(0, err.shape[2] - c.y_error_num)
            start = max_start if c.use_last_y_error else self.rng.randint(0, max_start)
            piece = err[:, :, start : start + c.y_error_num]
            y = y.copy()
            y[:, 4:, : c.y_error_num] = y[:, 4:, : c.y_error_num] + piece
        if add_latent_err and self.buffers.has_latent_data(timestep):
            latents_w_error = latents + self.buffers.sample_latent_error(latents.shape, timestep)
        return noise_w_error.astype(np.float32), latents_w_error, y, use_clean

    # -- one full step --------------------------------------------------------

    def training_step(self, latents, context, y=None, clip_feature=None,
                      pose=None, audio_tuple=None):
        """latents (b,16,f,h,w) fp32; context (b,L,4096); y (b,20,f,h,w) or
        None; clip_feature (b,257,1280) or None; pose (b,3,F,H,W) raw [0,255]
        (dance); audio_tuple ((b,1,5,12,768),(b,n_t-1,8,12,768)) (talk).
        Returns metrics dict."""
        c = self.cfg
        latents = np.asarray(latents, np.float32)
        y_np = None if y is None else np.asarray(y, np.float32)
        clip_np = None if clip_feature is None else np.asarray(clip_feature, np.float32)
        self.iteration_count += 1

        tid, timestep = self.sample_timestep()
        noise_w_error, latents_w_error, y_np, use_clean = self.corrupt_inputs(
            latents, y_np, timestep
        )

        # variant dropouts (dance :1045-1062, talk :969-973)
        pose_keep = 1.0
        if pose is not None:
            if self.rng.random() < c.pose_drop_prob1 or self.rng.random() < c.pose_drop_prob2:
                pose_keep = 0.0
            if self.rng.random() < c.cond_drop_prob:
                if clip_np is not None:
                    clip_np = np.zeros_like(clip_np)
                if y_np is not None:
                    y_np = np.zeros_like(y_np)
        if audio_tuple is not None and self.rng.random() < c.audio_drop_prob:
            audio_tuple = (np.zeros_like(np.asarray(audio_tuple[0])),
                           np.zeros_like(np.asarray(audio_tuple[1])))

        b = latents.shape[0]
        batch = {
            "latents": jnp.asarray(latents),
            "noise_w_error": jnp.asarray(noise_w_error),
            "latents_w_error": jnp.asarray(latents_w_error),
            "timestep": jnp.full((b,), timestep, jnp.float32),
            "timestep_id": jnp.full((b,), tid, jnp.int32),
            "context": jnp.asarray(context, self.dit_cfg.dtype),
            "clip_feature": None if clip_np is None else jnp.asarray(clip_np, self.dit_cfg.dtype),
            "y": None if y_np is None else jnp.asarray(y_np, self.dit_cfg.dtype),
        }
        if c.train_pose:
            batch["pose"] = None if pose is None else jnp.asarray(np.asarray(pose, np.float32))
            # (b,1,1) so the 'data'-axis sharding of batch leaves applies
            batch["pose_keep"] = jnp.full((b, 1, 1), pose_keep, jnp.float32)
        if audio_tuple is not None:
            batch["audio_first"] = jnp.asarray(np.asarray(audio_tuple[0], np.float32), self.dit_cfg.dtype)
            batch["audio_vf"] = jnp.asarray(np.asarray(audio_tuple[1], np.float32), self.dit_cfg.dtype)
        else:
            batch["audio_first"] = None
            batch["audio_vf"] = None
        self.trainable, self.opt_state, metrics = self._step_fn(
            self.trainable, self.opt_state, self.base_params, batch
        )

        if c.use_error_recycling:
            # warmup phase banks every (gathered) batch entry; afterwards the
            # local entries only (in-process the full batch IS the gather).
            update = True
            if use_clean:
                update = self.rng.random() < c.clean_buffer_update_prob
            if update:
                noise_err = np.asarray(metrics["noise_error"], np.float32)
                y_err = np.asarray(metrics["y_error"], np.float32)
                for i in range(noise_err.shape[0]):
                    self.buffers.add_latent_error(noise_err[i : i + 1], timestep)
                    self.buffers.add_y_error(y_err[i : i + 1], timestep)

        out = {
            "loss": float(metrics["loss"]),
            "grad_norm": float(metrics["grad_norm"]),
            "timestep": timestep,
            "grid": self.buffers.grid_index(timestep),
            "used_clean_input": use_clean,
            "warmup": self.iteration_count <= c.buffer_warmup_iter,
        }
        out.update({f"buffer_{k}": v for k, v in self.buffers.stats().items()
                    if not isinstance(v, dict)})
        return out

    # -- checkpointing ----------------------------------------------------------

    def save_lora_safetensors(self, path: str, side_modules: Optional[dict] = None):
        """LoRA-only export in peft naming (the analog of Lightning's stripped
        on_save_checkpoint :1294-1304 + utils/extract_lora.py)."""
        from safetensors.numpy import save_file

        sd = lora_mod.to_peft_state_dict(self.lora) if self.lora is not None else {}
        if "customtalk" in self.trainable:
            # export customtalk FFNs in torch naming (fuseable via load_models)
            for mod_name, sub in self.trainable["customtalk"].items():
                for idx, leaf in sub.items():
                    w = np.asarray(leaf["w"], np.float32)
                    L = w.shape[0]
                    for i in range(L):
                        sd[f"blocks.{i}.{mod_name}.{idx}.weight"] = w[i].T.copy()
                        sd[f"blocks.{i}.{mod_name}.{idx}.bias"] = np.asarray(leaf["b"][i], np.float32)
        if self.cfg.train_pose and "pose" in self.trainable:
            # torch Sequential numbering 0,2,4,... with (out,in,kt,kh,kw) layout
            for i, conv in enumerate(self.trainable["pose"]):
                w = np.transpose(np.asarray(conv["w"], np.float32), (4, 3, 0, 1, 2))
                sd[f"dwpose_embedding.{2 * i}.weight"] = w
                sd[f"dwpose_embedding.{2 * i}.bias"] = np.asarray(conv["b"], np.float32)
        if side_modules:
            sd.update({k: np.asarray(v, np.float32) for k, v in side_modules.items()})
        save_file(sd, path)

    def load_lora_safetensors(self, path: str):
        from safetensors.numpy import load_file

        sd = load_file(path)
        self.trainable["lora"] = lora_mod.from_peft_state_dict(sd, self.dit_cfg)
        if self.cfg.train_pose and any("dwpose_embedding" in k for k in sd):
            from ..models import pose_embedding

            self.trainable["pose"] = pose_embedding.params_from_torch_state_dict(sd)
        self.opt_state = self.optimizer.init(self.trainable)

    def save_checkpoint(self, ckpt_dir: str):
        """Full resumable state: LoRA + optimizer (orbax) + error buffers +
        counters. (The reference does NOT checkpoint buffers — resume silently
        restarts buffer warmup, train_svi.py DevLog; we keep them.)"""
        import os
        import pickle

        import orbax.checkpoint as ocp

        ckpt_dir = os.path.abspath(ckpt_dir)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(ckpt_dir, "train_state"), {
                "trainable": self.trainable, "opt_state": self.opt_state,
            })
        with open(os.path.join(ckpt_dir, "host_state.pkl"), "wb") as f:
            pickle.dump({
                "iteration_count": self.iteration_count,
                "latent_error_buffer": self.buffers.latent_error_buffer,
                "y_error_buffer": self.buffers.y_error_buffer,
                "rng_state": self.rng.getstate(),
            }, f)

    def restore_checkpoint(self, ckpt_dir: str):
        import os
        import pickle

        import orbax.checkpoint as ocp

        ckpt_dir = os.path.abspath(ckpt_dir)
        template = {"trainable": self.trainable, "opt_state": self.opt_state}
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(os.path.join(ckpt_dir, "train_state"), template)
        self.trainable, self.opt_state = state["trainable"], state["opt_state"]
        host_path = os.path.join(ckpt_dir, "host_state.pkl")
        if os.path.exists(host_path):
            with open(host_path, "rb") as f:
                host = pickle.load(f)
            self.iteration_count = host["iteration_count"]
            self.buffers.latent_error_buffer = host["latent_error_buffer"]
            self.buffers.y_error_buffer = host["y_error_buffer"]
            self.rng.setstate(host["rng_state"])
