"""Smoke tests for the scripts/ workflow wrappers and download helpers."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
WRAPPERS = sorted((REPO / "scripts").glob("*/*.sh"))
DOWNLOADS = sorted((REPO / "download").glob("*.sh"))


@pytest.mark.parametrize("script", WRAPPERS, ids=lambda p: p.parent.name + "/" + p.name)
def test_wrapper_reaches_cli_help(script, tmp_path):
    """Every wrapper forwards extra args to a real argparse CLI (--help
    exits 0 and prints a usage line) without needing datasets."""
    out = subprocess.run(
        [str(script), "--help"], cwd=REPO, capture_output=True, text=True, timeout=300,
        env={"PATH": f"{Path(sys.executable).parent}:/usr/bin:/bin:/usr/local/bin",
             "HOME": str(tmp_path),
             "OPENSCENE_DATA_ROOT": str(tmp_path), "NAVSIM_EXP_ROOT": str(tmp_path),
             "PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "usage:" in out.stdout


def test_download_scripts_have_valid_syntax():
    for script in DOWNLOADS:
        subprocess.run(["bash", "-n", str(script)], check=True)


def test_split_defaults():
    """Evaluation wrappers default to navtest, training wrappers to navtrain
    (regression: common.sh used to pre-set navtest for everyone)."""
    for sub, expect in [("evaluation", "navtest"), ("training", "navtrain")]:
        script = next((REPO / "scripts" / sub).glob("run_*.sh"))
        src = script.read_text()
        assert f': "${{TRAIN_TEST_SPLIT:={expect}}}"' in src, (script, expect)
    common = (REPO / "scripts" / "common.sh").read_text()
    assert "TRAIN_TEST_SPLIT:=" not in common
