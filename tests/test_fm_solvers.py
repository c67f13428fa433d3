"""Golden parity: flow-matching UniPC / DPM-Solver++ multistep schedulers vs
the reference (diffsynth/utils/fm_solvers_unipc.py, fm_solvers.py)."""

import numpy as np
import pytest
import torch

from reference_loader import load_ref_module

from svi_tpu.schedulers.fm_solvers import (
    FlowDPMSolverMultistepScheduler,
    FlowUniPCMultistepScheduler,
    get_sampling_sigmas,
)

ref_unipc = load_ref_module("diffsynth.utils.fm_solvers_unipc")
ref_dpm = load_ref_module("diffsynth.utils.fm_solvers")


def _fake_model(sample, i):
    """Deterministic pseudo model output depending on sample and step."""
    return (0.3 * sample + 0.1 * np.sin(i + 1)).astype(np.float32)


def _run_ours(sched, steps, shift, shape=(1, 4, 2, 3, 3), seed=0):
    sched.set_timesteps(steps, shift=shift)
    rng = np.random.default_rng(seed)
    sample = rng.standard_normal(shape).astype(np.float32)
    traj = []
    for i, t in enumerate(sched.timesteps):
        out = _fake_model(sample, i)
        sample = np.asarray(sched.step(out, t, sample), np.float32)
        traj.append(sample.copy())
    return traj


def _run_ref(sched, steps, shift, shape=(1, 4, 2, 3, 3), seed=0):
    sched.set_timesteps(steps, shift=shift)
    rng = np.random.default_rng(seed)
    sample = torch.tensor(rng.standard_normal(shape).astype(np.float32))
    traj = []
    with torch.no_grad():
        for i, t in enumerate(sched.timesteps):
            out = torch.tensor(_fake_model(sample.numpy(), i))
            sample = sched.step(out, t, sample).prev_sample
            traj.append(sample.numpy().copy())
    return traj


@pytest.mark.parametrize("order,solver_type,steps", [
    (2, "bh2", 10), (2, "bh1", 10), (3, "bh2", 20), (1, "bh2", 6),
])
def test_unipc_trajectory_parity(order, solver_type, steps):
    ours = _run_ours(
        FlowUniPCMultistepScheduler(solver_order=order, solver_type=solver_type),
        steps, shift=5.0,
    )
    ref = _run_ref(
        ref_unipc.FlowUniPCMultistepScheduler(solver_order=order, solver_type=solver_type),
        steps, shift=5.0,
    )
    assert len(ours) == len(ref) == steps
    for i, (a, b) in enumerate(zip(ours, ref)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5, err_msg=f"step {i}")


def test_unipc_disable_corrector_and_timesteps():
    ours_s = FlowUniPCMultistepScheduler(disable_corrector=[0])
    ref_s = ref_unipc.FlowUniPCMultistepScheduler(disable_corrector=[0])
    ours = _run_ours(ours_s, 8, shift=3.0)
    ref = _run_ref(ref_s, 8, shift=3.0)
    np.testing.assert_allclose(ours[-1], ref[-1], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours_s.sigmas), ref_s.sigmas.numpy(), atol=1e-7)
    np.testing.assert_array_equal(np.asarray(ours_s.timesteps), ref_s.timesteps.numpy())


@pytest.mark.parametrize("order,solver_type,steps", [
    (2, "midpoint", 10), (2, "heun", 10), (3, "midpoint", 20), (1, "midpoint", 6),
])
def test_dpm_trajectory_parity(order, solver_type, steps):
    ours = _run_ours(
        FlowDPMSolverMultistepScheduler(solver_order=order, solver_type=solver_type),
        steps, shift=5.0,
    )
    ref = _run_ref(
        ref_dpm.FlowDPMSolverMultistepScheduler(solver_order=order, solver_type=solver_type),
        steps, shift=5.0,
    )
    for i, (a, b) in enumerate(zip(ours, ref)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5, err_msg=f"step {i}")


def test_add_noise_and_sampling_sigmas():
    ours_s = FlowUniPCMultistepScheduler()
    ref_s = ref_unipc.FlowUniPCMultistepScheduler()
    ours_s.set_timesteps(10, shift=5.0)
    ref_s.set_timesteps(10, shift=5.0)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 3, 3)).astype(np.float32)
    n = rng.standard_normal((2, 4, 3, 3)).astype(np.float32)
    t = np.asarray(ours_s.timesteps[:2])
    a = ours_s.add_noise(x, n, t)
    b = ref_s.add_noise(torch.tensor(x), torch.tensor(n),
                        torch.tensor(t)).numpy()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        get_sampling_sigmas(12, 4.0), ref_dpm.get_sampling_sigmas(12, 4.0), atol=1e-12
    )


@pytest.mark.parametrize("order,solver_type,steps", [
    (1, "midpoint", 8), (2, "midpoint", 10), (2, "heun", 10),
])
def test_dpm_sde_trajectory_parity(order, solver_type, steps):
    """sde-dpmsolver++ (ref fm_solvers.py:475-479, :570-582): identical
    per-step variance_noise injected on both sides."""
    ours_s = FlowDPMSolverMultistepScheduler(
        solver_order=order, solver_type=solver_type,
        algorithm_type="sde-dpmsolver++")
    ref_s = ref_dpm.FlowDPMSolverMultistepScheduler(
        solver_order=order, solver_type=solver_type,
        algorithm_type="sde-dpmsolver++")
    shape = (1, 4, 2, 3, 3)
    ours_s.set_timesteps(steps, shift=5.0)
    ref_s.set_timesteps(steps, shift=5.0)
    rng = np.random.default_rng(0)
    sample_o = rng.standard_normal(shape).astype(np.float32)
    sample_r = torch.tensor(sample_o.copy())
    nrng = np.random.default_rng(1)
    with torch.no_grad():
        for i, t in enumerate(ours_s.timesteps):
            noise = nrng.standard_normal(shape).astype(np.float32)
            out = _fake_model(sample_o, i)
            sample_o = np.asarray(
                ours_s.step(out, t, sample_o, variance_noise=noise), np.float32)
            out_r = torch.tensor(_fake_model(sample_r.numpy(), i))
            sample_r = ref_s.step(out_r, ref_s.timesteps[i], sample_r,
                                  variance_noise=torch.tensor(noise)).prev_sample
            np.testing.assert_allclose(sample_o, sample_r.numpy(),
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=f"step {i}")


def test_dpm_sde_int_seed_advances_rng():
    """An int `generator` seed must advance RNG state ACROSS steps (like the
    reference's torch Generator) — not re-seed per call, which injected the
    identical noise vector at every step (review r3). The same seed must also
    reproduce the same trajectory after set_timesteps."""
    def run(seed):
        s = FlowDPMSolverMultistepScheduler(
            solver_order=2, algorithm_type="sde-dpmsolver++")
        s.set_timesteps(6, shift=5.0)
        sample = np.ones((1, 4, 2, 2), np.float32)
        noises = []
        for i, t in enumerate(s.timesteps):
            before = sample.copy()
            sample = np.asarray(
                s.step(_fake_model(sample, i), t, sample, generator=seed),
                np.float32)
            noises.append(sample - before)
        return sample, noises

    out1, noises = run(7)
    # per-step deltas must not repeat (re-seeded rng gave identical noise)
    assert not np.allclose(noises[1], noises[2])
    out2, _ = run(7)
    np.testing.assert_array_equal(out1, out2)  # reproducible per trajectory
    out3, _ = run(8)
    assert not np.allclose(out1, out3)
