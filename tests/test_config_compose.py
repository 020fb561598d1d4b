"""Config composition tests: defaults lists, groups, env interpolation,
CLI overrides, snapshot round-trip, and the vendored configs/ tree."""

import os

import pytest

from diffusiondrive_tpu.config.compose import (
    ConfigError,
    apply_overrides,
    compose,
    config_get,
    load_config,
    resolve_interpolations,
    snapshot,
)


@pytest.fixture()
def config_tree(tmp_path):
    (tmp_path / "agent").mkdir()
    (tmp_path / "worker").mkdir()
    (tmp_path / "base.yaml").write_text("output_dir: /tmp/exp\nseed: 1\n")
    (tmp_path / "agent" / "cv.yaml").write_text("name: constant_velocity_agent\n")
    (tmp_path / "agent" / "dd.yaml").write_text(
        "name: diffusiondrive_agent\nconfig:\n  tf_d_model: 256\n"
    )
    (tmp_path / "worker" / "seq.yaml").write_text("name: sequential\n")
    (tmp_path / "main.yaml").write_text(
        "defaults:\n"
        "  - base\n"
        "  - agent: cv\n"
        "  - worker: seq\n"
        "  - _self_\n"
        "batch_size: 32\n"
        "cache_dir: ${output_dir}/cache\n"
        "seed: 7\n"
    )
    return tmp_path


def test_defaults_composition_and_self(config_tree):
    cfg = compose(config_tree / "main.yaml")
    assert cfg["agent"]["name"] == "constant_velocity_agent"
    assert cfg["worker"]["name"] == "sequential"
    assert cfg["batch_size"] == 32
    assert cfg["seed"] == 7           # _self_ overrides base.yaml
    assert cfg["cache_dir"] == "/tmp/exp/cache"  # key interpolation


def test_group_override_swaps_whole_group(config_tree):
    cfg = compose(config_tree / "main.yaml", ["agent=dd", "batch_size=64"])
    assert cfg["agent"]["name"] == "diffusiondrive_agent"
    assert cfg["agent"]["config"]["tf_d_model"] == 256
    assert cfg["batch_size"] == 64


def test_dotted_value_overrides(config_tree):
    cfg = compose(config_tree / "main.yaml",
                  ["agent.config.tf_d_model=128", "agent.checkpoint_path=/x.pth"])
    assert cfg["agent"]["config"]["tf_d_model"] == 128
    assert cfg["agent"]["checkpoint_path"] == "/x.pth"
    # YAML-typed values
    cfg = compose(config_tree / "main.yaml", ["batch_size=null", "seed=1.5"])
    assert cfg["batch_size"] is None and cfg["seed"] == 1.5


def test_env_interpolation(monkeypatch, tmp_path):
    (tmp_path / "c.yaml").write_text(
        "a: ${oc.env:DD_TEST_VAR}\nb: ${oc.env:DD_TEST_MISSING,fallback}\n"
        "c: prefix-${env:DD_TEST_VAR}-suffix\nd: ${oc.env:DD_TEST_MISSING,123}\n"
    )
    monkeypatch.setenv("DD_TEST_VAR", "hello")
    cfg = compose(tmp_path / "c.yaml")
    assert cfg["a"] == "hello"
    assert cfg["b"] == "fallback"
    assert cfg["c"] == "prefix-hello-suffix"
    assert cfg["d"] == 123


def test_missing_env_raises(tmp_path):
    (tmp_path / "c.yaml").write_text("a: ${oc.env:DD_DEFINITELY_MISSING}\n")
    with pytest.raises(ConfigError):
        compose(tmp_path / "c.yaml")


def test_interpolation_cycle_raises(tmp_path):
    (tmp_path / "c.yaml").write_text("a: ${b}\nb: ${a}\n")
    with pytest.raises(ConfigError):
        compose(tmp_path / "c.yaml")


def test_full_string_interp_preserves_type(tmp_path):
    (tmp_path / "c.yaml").write_text("count: 4\nalias: ${count}\nnested:\n  inner: ${count}\n")
    cfg = compose(tmp_path / "c.yaml")
    assert cfg["alias"] == 4 and isinstance(cfg["alias"], int)
    assert cfg["nested"]["inner"] == 4


def test_snapshot_roundtrip(config_tree, tmp_path):
    cfg = compose(config_tree / "main.yaml", ["agent=dd"])
    snap = snapshot(cfg, tmp_path / "out")
    assert compose(snap) == cfg


def test_apply_overrides_pure():
    cfg = apply_overrides({"a": {"b": 1}}, ["a.b=2", "a.c=x", "d=true"])
    assert cfg == {"a": {"b": 2, "c": "x"}, "d": True}
    with pytest.raises(ConfigError):
        apply_overrides({}, ["no_equals"])


def test_config_get():
    cfg = {"a": {"b": 5}}
    assert config_get(cfg, "a.b") == 5
    assert config_get(cfg, "a.z", "dflt") == "dflt"


# --------------------------------------------------------------------------- #
# The vendored configs/ tree composes
# --------------------------------------------------------------------------- #


def test_vendored_default_evaluation(monkeypatch):
    monkeypatch.setenv("NAVSIM_EXP_ROOT", "/tmp/expdir")
    cfg = compose("default_evaluation", ["agent=diffusiondrive_agent", "split=navmini"])
    assert cfg["agent"]["name"] == "diffusiondrive_agent"
    assert cfg["metric_cache_path"] == "/tmp/expdir/metric_cache"
    assert cfg["split"] == "navmini"
    assert cfg["worker"]["name"] == "thread_pool"
    assert cfg["batch_size"] == 32


def test_vendored_training_and_caching(monkeypatch):
    monkeypatch.setenv("NAVSIM_EXP_ROOT", "/e")
    for name in ("default_training", "default_metric_caching", "default_dataset_caching",
                 "default_submission"):
        cfg = compose(name)
        assert isinstance(cfg, dict) and cfg  # composes + resolves
    cfg = compose("default_training", ["agent=ego_status_mlp_agent", "lr=1e-3"])
    assert cfg["agent"]["name"] == "ego_status_mlp_agent"
    assert cfg["lr"] == 1e-3
    assert cfg["cache_path"] == "/e/training_cache"


def test_load_config_unresolved_keeps_interp(config_tree):
    raw = load_config(config_tree / "main.yaml")
    assert raw["cache_dir"] == "${output_dir}/cache"
    resolved = resolve_interpolations(raw)
    assert resolved["cache_dir"] == "/tmp/exp/cache"
