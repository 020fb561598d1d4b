"""Packaging parity: the reference devkit is pip-installable
(`/root/reference/setup.py:16-22`); this repo must be too, plus console
entry points for every L8 entry point (SURVEY §1).

Installs the repo editable into a fresh venv (offline: --no-build-isolation
+ --no-deps, system-site-packages for the baked-in jax stack) and smokes an
import plus one console script's --help.
"""

from __future__ import annotations

import subprocess
import sysconfig
import venv
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_editable_install_and_console_scripts(tmp_path):
    env_dir = tmp_path / "venv"
    venv.EnvBuilder(system_site_packages=True, with_pip=True).create(env_dir)
    py = env_dir / "bin" / "python"

    # This test environment is itself a venv, so --system-site-packages
    # exposes the *base* interpreter's site-packages, not the running one's
    # (where jax/setuptools actually live). Bridge with a .pth file.
    running_site = Path(sysconfig.get_paths()["purelib"])
    venv_site = next((env_dir / "lib").glob("python*")) / "site-packages"
    (venv_site / "_host_site.pth").write_text(f"{running_site}\n")

    install = subprocess.run(
        [str(py), "-m", "pip", "install", "-e", str(REPO_ROOT),
         "--no-build-isolation", "--no-deps", "--quiet"],
        capture_output=True, text=True, timeout=600,
    )
    assert install.returncode == 0, install.stderr

    imp = subprocess.run(
        [str(py), "-c",
         "import diffusiondrive_tpu, diffusiondrive_tpu.script.run_training"],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
    )
    assert imp.returncode == 0, imp.stderr

    score_cli = env_dir / "bin" / "diffusiondrive-tpu-score"
    assert score_cli.exists(), "console script not installed"
    help_run = subprocess.run(
        [str(score_cli), "--help"], capture_output=True, text=True,
        timeout=300, cwd=str(tmp_path),
    )
    assert help_run.returncode == 0, help_run.stderr
    assert "usage" in help_run.stdout.lower()


def test_pyproject_declares_all_entry_points():
    """Every run_*.py entry point has a console script (cheap static check)."""
    try:
        import tomllib
    except ModuleNotFoundError:  # py<3.11
        pytest.skip("tomllib unavailable")
    with open(REPO_ROOT / "pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    targets = {v.split(":")[0] for v in scripts.values()}
    for script in (REPO_ROOT / "diffusiondrive_tpu" / "script").glob("run_*.py"):
        assert f"diffusiondrive_tpu.script.{script.stem}" in targets, (
            f"{script.stem} has no console entry point"
        )
    for module, fn in (v.split(":") for v in scripts.values()):
        mod = __import__(module, fromlist=[fn])
        assert callable(getattr(mod, fn))
