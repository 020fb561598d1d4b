"""Test config: force JAX onto a virtual 8-device CPU mesh.

Runs before any test imports jax. Note: this image's sitecustomize registers
a TPU ('axon') PJRT plugin and pins JAX_PLATFORMS=axon, so the env var alone
is not enough — we must set the `jax_platforms` config before the backend
initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# This host exposes few cores; the 8 virtual devices' collective threads can
# starve under concurrent load and blow XLA:CPU's default 40s-abort
# rendezvous timeouts (rendezvous.cc kills the whole process). Raise them —
# this is the root cause of the historical "intermittent abort in full-suite
# runs" (previously attributed to buffer donation).
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=1200"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags
# NOTE: the persistent compilation cache is deliberately DISABLED for tests.
# On this image XLA:CPU compilation is routed to a remote machine with
# different CPU features (+prefer-no-scatter/avx512 etc.); loading those AOT
# executables intermittently SIGILLs ("Fatal Python error: Aborted" during
# jitted execution). Correctness over re-run speed.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax

jax.config.update("jax_platforms", "cpu")


# --------------------------------------------------------------------------- #
# Shared synthetic OpenScene log fixture
# --------------------------------------------------------------------------- #

import pickle
from pathlib import Path

import numpy as np
import pytest

from diffusiondrive_tpu.common.geometry import yaw_to_quaternion

NUM_FRAMES = 15
CAM_NAMES = ["CAM_F0", "CAM_L0", "CAM_L1", "CAM_L2", "CAM_R0", "CAM_R1", "CAM_R2", "CAM_B0"]


def write_pcd(path: Path, points: np.ndarray) -> None:
    """Write a binary PCD with (x, y, z, intensity, ring, lidar_id) fields."""
    n = points.shape[1]
    header = (
        "VERSION 0.7\nFIELDS x y z intensity ring lidar_id\n"
        "SIZE 4 4 4 4 4 4\nTYPE F F F F F F\nCOUNT 1 1 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA binary\n"
    )
    with open(path, "wb") as fp:
        fp.write(header.encode("ascii"))
        fp.write(points.T.astype(np.float32).tobytes())


@pytest.fixture(scope="module")
def synthetic_log(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("openscene")
    logs_dir = root / "logs"
    blobs_dir = root / "blobs"
    logs_dir.mkdir()
    (blobs_dir / "cams").mkdir(parents=True)
    (blobs_dir / "lidar").mkdir(parents=True)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(1080, 1920, 3), dtype=np.uint8)
    cv2.imwrite(str(blobs_dir / "cams" / "img.jpg"), img)

    # lidar: a box of points ahead of ego plus ground returns
    pts = np.zeros((6, 500), np.float32)
    pts[0] = rng.uniform(-30, 30, 500)
    pts[1] = rng.uniform(-30, 30, 500)
    pts[2] = rng.uniform(0.3, 2.0, 500)
    write_pcd(blobs_dir / "lidar" / "pc.pcd", pts)

    frames = []
    for i in range(NUM_FRAMES):
        x = 2.0 * i  # ego drives +x at 4 m/s (0.5 s interval)
        frames.append(
            dict(
                token=f"token_{i:03d}",
                timestamp=int(i * 5e5),
                log_name="log_a",
                scene_token="scene_a",
                map_location="us-ma-boston",
                roadblock_ids=["rb1"],
                traffic_lights=[],
                ego2global_translation=[x, 0.0, 0.0],
                ego2global_rotation=list(yaw_to_quaternion(0.0)),
                ego_dynamic_state=[4.0, 0.0, 0.0, 0.0],
                driving_command=[0, 1, 0, 0],
                cams={
                    name: dict(
                        data_path="cams/img.jpg",
                        sensor2lidar_rotation=np.eye(3),
                        sensor2lidar_translation=np.zeros(3),
                        cam_intrinsic=np.eye(3),
                        distortion=np.zeros(5),
                    )
                    for name in CAM_NAMES
                },
                lidar_path="lidar/pc.pcd",
                anns=dict(
                    # parked vehicle at GLOBAL (16, 2): local x = 16 - ego_x
                    gt_boxes=np.array([[16.0 - x, 2.0, 0.5, 4.5, 2.0, 1.7, 0.1]], np.float32),
                    gt_names=["vehicle"],
                    gt_velocity_3d=np.zeros((1, 3), np.float32),
                    instance_tokens=["inst_0"],
                    track_tokens=["track_0"],
                ),
            )
        )
    with open(logs_dir / "log_a.pkl", "wb") as fp:
        pickle.dump(frames, fp)
    return logs_dir, blobs_dir


