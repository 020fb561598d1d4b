"""nuScenes L2/collision metric tests + ablation registry + emergency brake."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffusiondrive_tpu.evaluate.nuscenes_metrics import collision_rate, l2_displacement


def test_l2_displacement():
    T = 6  # 3s at 0.5s
    gt = np.zeros((2, T, 3), np.float32)
    gt[:, :, 0] = np.arange(1, T + 1) * 2.0
    pred = gt.copy()
    pred[1, :, 1] += 1.0  # constant 1 m lateral error

    out = l2_displacement(jnp.asarray(pred), jnp.asarray(gt))
    np.testing.assert_allclose(np.asarray(out["l2_1s"]), [0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["l2_avg"]), [0.0, 1.0], atol=1e-6)


def test_collision_rate():
    T, O = 6, 2
    pred = np.zeros((2, T, 3), np.float32)
    pred[:, :, 0] = np.arange(1, T + 1) * 2.0  # driving +x

    boxes = np.zeros((2, T, O, 5), np.float32)
    valid = np.zeros((2, T, O), bool)
    # sample 0: a box sitting at x=4 from t=0 -> hit at step 2 (1.0s horizon covers steps 0-1)
    boxes[0, :, 0] = [4.0, 0.0, 0.0, 4.0, 2.0]
    valid[0, :, 0] = True
    # sample 1: box far away
    boxes[1, :, 0] = [100.0, 0.0, 0.0, 4.0, 2.0]
    valid[1, :, 0] = True

    out = collision_rate(jnp.asarray(pred), jnp.asarray(boxes), jnp.asarray(valid))
    # ego center at step0 x=2+1.46, half length 2.59 -> reaches 6.04; box rear at 2 -> hit at 1s already
    assert float(out["collision_1s"][0]) == 1.0
    assert float(out["collision_3s"][0]) == 1.0
    assert float(out["collision_3s"][1]) == 0.0


def test_ablation_and_nuscenes_registry():
    from diffusiondrive_tpu.config.registry import build_agent

    vanilla = build_agent("diffusiondrive_vanilla_ddim_agent")
    assert vanilla.config.diffusion_test_steps == 20
    from diffusiondrive_tpu.ops.ddim import DDIMScheduler

    ts = DDIMScheduler().truncated_rollout_timesteps(20, 20)
    assert ts == tuple(range(19, -1, -1))

    nusc = build_agent("diffusiondrive_nuscenes_agent")
    assert nusc.config.image_architecture == "resnet50"
    assert nusc.config.num_poses == 6


def test_emergency_brake():
    from diffusiondrive_tpu.common.enums import StateIndex
    from diffusiondrive_tpu.planning.pdm_closed.emergency_brake import PDMEmergencyBrake

    brake = PDMEmergencyBrake()
    assert brake.should_brake(1.5, np.inf)
    assert not brake.should_brake(np.inf, np.inf)

    state = np.zeros(StateIndex.size())
    state[StateIndex.VELOCITY_X] = 8.1  # stops in 2s at 4.05 m/s^2
    poses = brake.brake_trajectory(state)
    assert poses.shape == (51, 3)
    dist = poses[-1, 0]
    assert dist == pytest.approx(8.1**2 / (2 * 4.05), abs=0.05)
    # monotone, then stationary
    assert np.all(np.diff(poses[:, 0]) >= -1e-9)
    assert poses[-1, 0] == pytest.approx(poses[-5, 0], abs=1e-6)
