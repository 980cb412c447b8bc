"""The framework's core usage contract (README.md:20-48 of the reference):
train expert networks first, then the DynMM router loads them. Chains the
actual CLIs in one working dir and asserts the experts are found and grafted.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # full CLI/parity/mesh drive; -m "not slow" skips

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(script, args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["DYNMM_FORCE_CPU"] = "1"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1100,
    )


def test_imdb_two_step_workflow(tmp_path):
    # Step I: expert networks
    r = run("examples/multimedia/imdb_uni.py",
            ["--synthetic", "--n-epochs", "1", "--mod", "0"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    r = run("examples/multimedia/imdb_mm.py",
            ["--synthetic", "--n-epochs", "1", "--fuse", "1"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(tmp_path / "log/imdb/encoder_text.msgpack")
    assert os.path.exists(tmp_path / "log/imdb/best_lf.msgpack")

    # Step II: router grafts the experts
    r = run("examples/multimedia/imdb_dyn.py",
            ["--synthetic", "--n-epochs", "1", "--freeze", "--reg", "0.1"],
            tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loaded expert" in r.stdout
    assert "encoder_text" in r.stdout and "best_lf" in r.stdout
    assert "branch ratio" in r.stdout
