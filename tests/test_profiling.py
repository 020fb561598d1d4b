"""Profiling utilities: trace capture, HLO op attribution, CLI plumb-through."""

import subprocess
import sys

import jax
import jax.numpy as jnp

from diffusiondrive_tpu.utils.profiling import (
    PhaseTimer,
    _bucket,
    device_time_by_component,
    op_names_from_hlo,
    profile_jitted,
)


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("io"):
        pass
    with t.phase("io"):
        pass
    s = t.summary()
    assert s["io"]["count"] == 2 and s["io"]["total_s"] >= 0.0


def test_op_name_parsing_and_buckets():
    hlo = (
        '%fusion.1 = f32[8]{0} fusion(%p0), metadata={op_name="jit(f)/Model/backbone/layer1/conv1/conv"}\n'
        '%copy.2 = f32[8]{0} copy(%p1), metadata={op_name="jit(f)/Model/head/dense"}\n'
    )
    ops = op_names_from_hlo(hlo)
    assert ops["fusion.1"].endswith("conv1/conv")
    assert _bucket(ops["fusion.1"], depth=2) == "backbone/layer1"
    assert _bucket(ops["copy.2"], depth=2) == "head/dense"


def test_profile_jitted_runs(tmp_path):
    """End-to-end plumbing on whatever backend is available: trace a jitted
    fn, join to its HLO, return a dict (empty on XLA:CPU — no device
    timeline — but the capture, HLO dump, and join must not crash)."""

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x)

    x = jnp.ones((64, 64))
    table = profile_jitted(f, x, launches=2, trace_dir=str(tmp_path / "tr"))
    assert isinstance(table, dict)
    hlo = f.lower(x).compile().as_text()
    assert isinstance(device_time_by_component(str(tmp_path / "tr"), hlo), dict)


def test_cli_help():
    out = subprocess.run(
        [sys.executable, "-m", "diffusiondrive_tpu.script.run_profile", "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0
    assert "per-component" in out.stdout
