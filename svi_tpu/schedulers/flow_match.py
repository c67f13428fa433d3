"""Rectified-flow ("flow match") scheduler as pure JAX functions.

Behavioral reference: diffsynth/schedulers/flow_match.py (FlowMatchScheduler).
The SVI stack uses it with shift=5, sigma_min=0.0, extra_one_step=True,
num_train_timesteps=1000 (diffsynth/pipelines/svi_video.py:144).

Everything here is shape-static and jit-friendly: the sigma table is a fixed
array computed once per (num_inference_steps, shift, ...) configuration, and
`step`/`add_noise` take either a step *index* (preferred inside `lax.scan`
denoise loops) or a continuous timestep that is resolved by nearest-neighbor
lookup exactly like the reference (argmin |timesteps - t|).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    """Immutable sigma/timestep table (pytree of two arrays + static config)."""

    sigmas: jax.Array  # (num_steps,) float32
    timesteps: jax.Array  # (num_steps,) float32, = sigmas * num_train_timesteps
    num_train_timesteps: int = 1000
    # set when built with training=True
    training_weights: jax.Array | None = None

    def __len__(self) -> int:
        return int(self.sigmas.shape[0])


def tree_flatten(s):  # pragma: no cover - trivial
    return (s.sigmas, s.timesteps, s.training_weights), s.num_train_timesteps


def tree_unflatten(aux, children):  # pragma: no cover - trivial
    sigmas, timesteps, w = children
    return FlowMatchSchedule(sigmas, timesteps, aux, w)


jax.tree_util.register_pytree_node(FlowMatchSchedule, tree_flatten, tree_unflatten)


def make_schedule(
    num_inference_steps: int,
    shift: float = 3.0,
    sigma_max: float = 1.0,
    sigma_min: float = 0.003 / 1.002,
    denoising_strength: float = 1.0,
    inverse_timesteps: bool = False,
    extra_one_step: bool = False,
    reverse_sigmas: bool = False,
    num_train_timesteps: int = 1000,
    training: bool = False,
) -> FlowMatchSchedule:
    """Build the sigma table (ref: flow_match.py:31-50 set_timesteps).

    sigma' = shift * sigma / (1 + (shift - 1) * sigma)  — timestep shift warp.
    """
    sigma_start = sigma_min + (sigma_max - sigma_min) * denoising_strength
    if extra_one_step:
        sigmas = np.linspace(sigma_start, sigma_min, num_inference_steps + 1, dtype=np.float64)[:-1]
    else:
        sigmas = np.linspace(sigma_start, sigma_min, num_inference_steps, dtype=np.float64)
    if inverse_timesteps:
        sigmas = sigmas[::-1].copy()
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    if reverse_sigmas:
        sigmas = 1 - sigmas
    timesteps = sigmas * num_train_timesteps

    weights = None
    if training:
        # Gaussian bell over timesteps (ref: flow_match.py:45-50). NB the reference
        # evaluates the bell on the *timestep values* against num_inference_steps/2.
        x = timesteps
        y = np.exp(-2 * ((x - num_inference_steps / 2) / num_inference_steps) ** 2)
        y_shifted = y - y.min()
        weights = jnp.asarray(y_shifted * (num_inference_steps / y_shifted.sum()), dtype=jnp.float32)

    return FlowMatchSchedule(
        sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
        timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
        num_train_timesteps=num_train_timesteps,
        training_weights=weights,
    )


def timestep_id(schedule: FlowMatchSchedule, timestep) -> jax.Array:
    """Nearest schedule entry for a continuous timestep (ref: flow_match.py:56)."""
    return jnp.argmin(jnp.abs(schedule.timesteps - timestep))


def step(
    schedule: FlowMatchSchedule,
    model_output: jax.Array,
    timestep,
    sample: jax.Array,
    to_final: bool = False,
    self_corr: bool = False,
    inverse_timesteps: bool = False,
    reverse_sigmas: bool = False,
    by_index: bool = False,
) -> jax.Array:
    """One Euler step of the rectified-flow ODE (ref: flow_match.py:53-64).

    `by_index=True` treats `timestep` as an integer index into the schedule
    (jit-friendly for `lax.scan` over denoise steps).
    """
    tid = jnp.asarray(timestep) if by_index else timestep_id(schedule, timestep)
    sigma = schedule.sigmas[tid]
    n = schedule.sigmas.shape[0]
    final_sigma = jnp.float32(1.0 if (inverse_timesteps or reverse_sigmas or self_corr) else 0.0)
    if to_final:
        sigma_next = final_sigma
    else:
        # out-of-range gather clamps on TPU/XLA; pick final_sigma explicitly instead.
        sigma_next = jnp.where(
            tid + 1 >= n, final_sigma, schedule.sigmas[jnp.minimum(tid + 1, n - 1)]
        )
    dtype = sample.dtype
    out = sample.astype(jnp.float32) + model_output.astype(jnp.float32) * (sigma_next - sigma)
    return out.astype(dtype)


def return_to_timestep(
    schedule: FlowMatchSchedule, timestep, sample: jax.Array, sample_stabilized: jax.Array,
    by_index: bool = False,
) -> jax.Array:
    """Invert one step: recover the velocity that maps sample→stabilized
    (ref: flow_match.py:67-73)."""
    tid = jnp.asarray(timestep) if by_index else timestep_id(schedule, timestep)
    sigma = schedule.sigmas[tid]
    return (sample - sample_stabilized) / sigma


def add_noise(
    schedule: FlowMatchSchedule, original_samples: jax.Array, noise: jax.Array, timestep,
    by_index: bool = False,
) -> jax.Array:
    """Linear interpolation toward noise at sigma(t) (ref: flow_match.py:76-82)."""
    tid = jnp.asarray(timestep) if by_index else timestep_id(schedule, timestep)
    sigma = schedule.sigmas[tid]
    dtype = original_samples.dtype
    out = (1 - sigma) * original_samples.astype(jnp.float32) + sigma * noise.astype(jnp.float32)
    return out.astype(dtype)


def training_target(sample: jax.Array, noise: jax.Array, timestep=None) -> jax.Array:
    """Velocity target for rectified flow (ref: flow_match.py:85-91)."""
    return noise - sample


def training_weight(schedule: FlowMatchSchedule, timestep) -> jax.Array:
    """Per-timestep Gaussian loss weight (ref: flow_match.py:94-97)."""
    assert schedule.training_weights is not None, "build schedule with training=True"
    tid = timestep_id(schedule, timestep)
    return schedule.training_weights[tid]


class FlowMatchScheduler:
    """Stateful wrapper with the reference's API surface (flow_match.py:3).

    Prefer the pure functions above inside jitted code; this class exists for
    pipeline-level drop-in parity with diffsynth's scheduler object.
    """

    def __init__(self, num_inference_steps=100, num_train_timesteps=1000, shift=3.0,
                 sigma_max=1.0, sigma_min=0.003 / 1.002, inverse_timesteps=False,
                 extra_one_step=False, reverse_sigmas=False):
        self.num_train_timesteps = num_train_timesteps
        self.shift = shift
        self.sigma_max = sigma_max
        self.sigma_min = sigma_min
        self.inverse_timesteps = inverse_timesteps
        self.extra_one_step = extra_one_step
        self.reverse_sigmas = reverse_sigmas
        self.set_timesteps(num_inference_steps)

    def set_timesteps(self, num_inference_steps=100, denoising_strength=1.0, training=False, shift=None):
        if shift is not None:
            self.shift = shift
        self.schedule = make_schedule(
            num_inference_steps,
            shift=self.shift,
            sigma_max=self.sigma_max,
            sigma_min=self.sigma_min,
            denoising_strength=denoising_strength,
            inverse_timesteps=self.inverse_timesteps,
            extra_one_step=self.extra_one_step,
            reverse_sigmas=self.reverse_sigmas,
            num_train_timesteps=self.num_train_timesteps,
            training=training,
        )

    @property
    def sigmas(self):
        return self.schedule.sigmas

    @property
    def timesteps(self):
        return self.schedule.timesteps

    @property
    def linear_timesteps_weights(self):
        return self.schedule.training_weights

    def step(self, model_output, timestep, sample, to_final=False, **kwargs):
        return step(
            self.schedule, model_output, timestep, sample, to_final=to_final,
            self_corr=kwargs.get("self_corr", False),
            inverse_timesteps=self.inverse_timesteps, reverse_sigmas=self.reverse_sigmas,
        )

    def return_to_timestep(self, timestep, sample, sample_stabilized):
        return return_to_timestep(self.schedule, timestep, sample, sample_stabilized)

    def add_noise(self, original_samples, noise, timestep):
        return add_noise(self.schedule, original_samples, noise, timestep)

    def training_target(self, sample, noise, timestep=None):
        return training_target(sample, noise, timestep)

    def training_weight(self, timestep):
        return training_weight(self.schedule, timestep)
