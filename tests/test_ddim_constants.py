"""Pin the DDIM schedule to hand-derived closed-form constants.

`diffusers` is not installable in this environment, so instead of a
differential test the exact configuration the reference uses —
``DDIMScheduler(1000, scaled_linear, prediction_type="sample")`` with
train-noise t in [0, 50), truncation t=8 and test rollout [10, 0]
(`transfuser_model_v2.py:447-451,578-641`) — is frozen against literals
computed independently with 50-digit Decimal arithmetic:

    beta_i = (sqrt(1e-4) + i * (sqrt(0.02) - sqrt(1e-4)) / 999)^2
    alpha_cumprod_t = prod_{i<=t} (1 - beta_i)

A refactor that silently shifts the schedule (beta endpoints, cumprod
indexing, step spacing, truncation arithmetic) breaks these asserts.
"""

import numpy as np

from diffusiondrive_tpu.ops.ddim import DDIMScheduler

# alpha_cumprod at the timesteps the truncated-diffusion head touches,
# derived with Decimal(prec=50) from the formula above
ALPHA_CUMPROD = {
    0: 0.9999000000,
    7: 0.9991242431,
    8: 0.9990021940,    # training truncation timestep
    9: 0.9988772375,
    10: 0.9987493400,   # first rollout timestep
    49: 0.9911161887,   # last training-noise timestep (t ~ U[0, 50))
    50: 0.9908438118,
    999: 0.0007334125,
}


def test_alphas_cumprod_values():
    sched = DDIMScheduler()
    for t, expected in ALPHA_CUMPROD.items():
        np.testing.assert_allclose(float(sched.alphas_cumprod[t]), expected, atol=2e-7), t


def test_truncated_rollout_is_10_0():
    """(arange(2) * 20/2).round()[::-1] == (10, 0) — `transfuser_model_v2.py:585-587`."""
    sched = DDIMScheduler()
    assert sched.truncated_rollout_timesteps(num_steps=2, span=20) == (10, 0)
    # the 20-step vanilla ablation spans the full schedule
    full = sched.rollout_timesteps(20)
    assert full == tuple(range(950, -1, -50))


def test_add_noise_closed_form_t8():
    """x_8 = sqrt(a_8) x_0 + sqrt(1 - a_8) eps with a_8 = 0.9990021940."""
    sched = DDIMScheduler()
    x0 = np.full((1, 4), 2.0, np.float32)
    eps = np.full((1, 4), -1.0, np.float32)
    got = np.asarray(sched.add_noise(x0, eps, np.array([8])))
    a8 = ALPHA_CUMPROD[8]
    expected = np.sqrt(a8) * 2.0 + np.sqrt(1.0 - a8) * (-1.0)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_step_closed_form_t10_to_t0():
    """One sample-prediction DDIM step at t=10 with step ratio 10 lands on
    t=0: prev = sqrt(a_0) x0_hat + sqrt(1 - a_0) * eps_hat, with
    eps_hat = (x_t - sqrt(a_10) x0_hat) / sqrt(1 - a_10). Clipping is on
    (clip_sample_range=1), so |x0_hat| saturates at 1."""
    sched = DDIMScheduler()
    a10, a0 = ALPHA_CUMPROD[10], ALPHA_CUMPROD[0]

    sample = np.array([[0.5]], np.float32)
    model_out = np.array([[0.3]], np.float32)  # within clip range
    got = float(np.asarray(sched.step(model_out, 10, sample, num_inference_steps=100)))
    eps_hat = (0.5 - np.sqrt(a10) * 0.3) / np.sqrt(1.0 - a10)
    expected = np.sqrt(a0) * 0.3 + np.sqrt(1.0 - a0) * eps_hat
    # rtol 1e-4: the fp32 eps_hat divide by sqrt(1-a10)~0.035 amplifies rounding
    np.testing.assert_allclose(got, expected, rtol=1e-4)

    # out-of-range prediction clips to 1.0 before the update
    got_clip = float(np.asarray(sched.step(np.array([[3.0]], np.float32), 10, sample,
                                           num_inference_steps=100)))
    eps_hat = (0.5 - np.sqrt(a10) * 1.0) / np.sqrt(1.0 - a10)
    expected = np.sqrt(a0) * 1.0 + np.sqrt(1.0 - a0) * eps_hat
    np.testing.assert_allclose(got_clip, expected, rtol=1e-4)


def test_step_below_step_ratio_uses_final_alpha():
    """t=0 with step ratio 10: prev_t=-10 < 0 -> final_alpha_cumprod=1
    (set_alpha_to_one), so prev_sample == clipped prediction exactly."""
    sched = DDIMScheduler()
    out = np.array([[0.7]], np.float32)
    got = float(np.asarray(sched.step(out, 0, np.array([[0.1]], np.float32),
                                      num_inference_steps=100)))
    np.testing.assert_allclose(got, 0.7, rtol=1e-6)
