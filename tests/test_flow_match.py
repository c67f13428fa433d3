"""Golden-parity tests: svi_tpu FlowMatch scheduler vs reference flow_match.py."""

import numpy as np
import pytest
import torch

from reference_loader import load_ref_module

from svi_tpu.schedulers import flow_match as fm

ref_fm = load_ref_module("diffsynth.schedulers.flow_match")


def make_pair(**kw):
    ours = fm.FlowMatchScheduler(**kw)
    theirs = ref_fm.FlowMatchScheduler(**kw)
    return ours, theirs


SVI_KW = dict(shift=5, sigma_min=0.0, extra_one_step=True, num_train_timesteps=1000)


@pytest.mark.parametrize("steps,shift", [(50, 5.0), (50, 3.0), (20, 5.0), (1000, 5.0)])
def test_sigma_tables(steps, shift):
    ours, theirs = make_pair(**SVI_KW)
    ours.set_timesteps(steps, shift=shift)
    theirs.set_timesteps(steps, shift=shift)
    np.testing.assert_allclose(np.asarray(ours.sigmas), theirs.sigmas.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(ours.timesteps), theirs.timesteps.numpy(), rtol=1e-6, atol=1e-4
    )


def test_sigma_tables_default_config():
    ours, theirs = make_pair()
    np.testing.assert_allclose(np.asarray(ours.sigmas), theirs.sigmas.numpy(), rtol=1e-6, atol=1e-7)


def test_step_sequence_matches():
    ours, theirs = make_pair(**SVI_KW)
    ours.set_timesteps(10)
    theirs.set_timesteps(10)
    rng = np.random.default_rng(0)
    sample = rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32)
    s_ours, s_theirs = sample.copy(), torch.tensor(sample)
    for i in range(10):
        out = rng.standard_normal(sample.shape).astype(np.float32)
        t = theirs.timesteps[i]
        s_theirs = theirs.step(torch.tensor(out), t, s_theirs)
        s_ours = fm.step(ours.schedule, out, float(t), s_ours)
    np.testing.assert_allclose(np.asarray(s_ours), s_theirs.numpy(), rtol=1e-5, atol=1e-5)


def test_step_by_index_equals_by_timestep():
    ours, _ = make_pair(**SVI_KW)
    ours.set_timesteps(50)
    rng = np.random.default_rng(1)
    sample = rng.standard_normal((2, 4, 4)).astype(np.float32)
    out = rng.standard_normal(sample.shape).astype(np.float32)
    a = fm.step(ours.schedule, out, float(ours.timesteps[13]), sample)
    b = fm.step(ours.schedule, out, 13, sample, by_index=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


@pytest.mark.parametrize("to_final,self_corr", [(False, False), (True, False), (True, True), (False, True)])
def test_step_to_final_and_self_corr(to_final, self_corr):
    ours, theirs = make_pair(**SVI_KW)
    ours.set_timesteps(50)
    theirs.set_timesteps(50)
    rng = np.random.default_rng(2)
    sample = rng.standard_normal((1, 4, 4)).astype(np.float32)
    out = rng.standard_normal(sample.shape).astype(np.float32)
    for i in [0, 25, 49]:
        t = theirs.timesteps[i]
        a = fm.step(ours.schedule, out, float(t), sample, to_final=to_final, self_corr=self_corr)
        b = theirs.step(torch.tensor(out), t, torch.tensor(sample), to_final=to_final, self_corr=self_corr)
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-5, atol=1e-6)


def test_add_noise_and_target():
    ours, theirs = make_pair(**SVI_KW)
    ours.set_timesteps(50)
    theirs.set_timesteps(50)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 16, 2, 4, 4)).astype(np.float32)
    noise = rng.standard_normal(x.shape).astype(np.float32)
    for i in [0, 10, 49]:
        t = theirs.timesteps[i]
        a = fm.add_noise(ours.schedule, x, noise, float(t))
        b = theirs.add_noise(torch.tensor(x), torch.tensor(noise), t)
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fm.training_target(x, noise)),
        theirs.training_target(torch.tensor(x), torch.tensor(noise), None).numpy(),
    )


def test_training_weights():
    ours, theirs = make_pair(**SVI_KW)
    ours.set_timesteps(1000, training=True)
    theirs.set_timesteps(1000, training=True)
    np.testing.assert_allclose(
        np.asarray(ours.schedule.training_weights),
        theirs.linear_timesteps_weights.numpy(),
        rtol=1e-4, atol=1e-6,
    )
    for tval in [1.0, 500.0, 980.0]:
        a = fm.training_weight(ours.schedule, tval)
        b = theirs.training_weight(torch.tensor(tval))
        np.testing.assert_allclose(float(a), float(b), rtol=1e-4)


def test_return_to_timestep():
    ours, theirs = make_pair(**SVI_KW)
    ours.set_timesteps(50)
    theirs.set_timesteps(50)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 4, 4)).astype(np.float32)
    y = rng.standard_normal(x.shape).astype(np.float32)
    t = theirs.timesteps[7]
    a = fm.return_to_timestep(ours.schedule, float(t), x, y)
    b = theirs.return_to_timestep(t, torch.tensor(x), torch.tensor(y))
    np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-5, atol=1e-6)


def test_ddim_scheduler_parity():
    ref_ddim = load_ref_module("diffsynth.schedulers.ddim")
    from svi_tpu.schedulers import EnhancedDDIMScheduler

    for kw in (dict(), dict(prediction_type="v_prediction", rescale_zero_terminal_snr=True),
               dict(beta_schedule="linear")):
        ours = EnhancedDDIMScheduler(**kw)
        theirs = ref_ddim.EnhancedDDIMScheduler(**kw)
        ours.set_timesteps(10)
        theirs.set_timesteps(10)
        np.testing.assert_allclose(ours.timesteps, theirs.timesteps.numpy(), atol=0)
        np.testing.assert_allclose(ours.alphas_cumprod, theirs.alphas_cumprod, rtol=1e-3, atol=1e-6)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 4, 4)).astype(np.float32)
        e = rng.standard_normal(x.shape).astype(np.float32)
        for i in [0, 5, 9]:
            t = theirs.timesteps[i]
            a = ours.step(e, float(t), x)
            b = theirs.step(torch.tensor(e), t, torch.tensor(x)).numpy()
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
        t = theirs.timesteps[3]
        np.testing.assert_allclose(
            ours.add_noise(x, e, float(t)),
            theirs.add_noise(torch.tensor(x), torch.tensor(e), t).numpy(), rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ours.training_target(x, e, float(t))),
            np.asarray(theirs.training_target(torch.tensor(x), torch.tensor(e), t)),
            rtol=1e-5,
        )


def test_continuous_ode_scheduler_parity():
    ref_ode = load_ref_module("diffsynth.schedulers.continuous_ode")
    from svi_tpu.schedulers import ContinuousODEScheduler

    ours = ContinuousODEScheduler(num_inference_steps=12)
    theirs = ref_ode.ContinuousODEScheduler(num_inference_steps=12)
    np.testing.assert_allclose(ours.sigmas, theirs.sigmas.numpy(), rtol=1e-4)
    np.testing.assert_allclose(ours.timesteps, theirs.timesteps.numpy(), rtol=1e-4, atol=1e-5)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 4)).astype(np.float32)
    e = rng.standard_normal(x.shape).astype(np.float32)
    for i in [0, 6, 11]:
        t = theirs.timesteps[i]
        a = ours.step(e.copy(), float(t), x.copy())
        b = theirs.step(torch.tensor(e), t, torch.tensor(x).clone()).numpy()
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)
    t = theirs.timesteps[4]
    np.testing.assert_allclose(
        ours.add_noise(x, e, float(t)),
        theirs.add_noise(torch.tensor(x), torch.tensor(e), t).numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        ours.training_target(x, e, float(t)),
        theirs.training_target(torch.tensor(x), torch.tensor(e), t).numpy(), rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        ours.training_weight(float(t)), float(theirs.training_weight(t)), rtol=1e-4,
    )
