"""Smoke tests for the affect (CMU-MOSEI) CLI surface and the 3-branch
router variant."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full CLI/parity/mesh drive; -m "not slow" skips

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestTriBranchRouter:
    def test_forward_and_uniform_ablation(self):
        from dynmm_tpu.data.affect import synthetic_mosei
        from dynmm_tpu.models.modality import MoseiTriBranchDynMMNet

        mods, labels, lengths = synthetic_mosei(n=4, seq_len=12)
        mods = [jnp.asarray(m) for m in mods]
        lengths = [jnp.asarray(l) for l in lengths]
        model = MoseiTriBranchDynMMNet()
        variables = model.init(jax.random.PRNGKey(0), mods, lengths)
        out, resource, w = model.apply(variables, mods, lengths, hard=True)
        assert out.shape == (4, 1) and w.shape == (4, 3)
        # uniform ablation = mean of the three branch predictions
        outs = [
            model.apply(variables, mods, lengths, infer_mode=i)[0]
            for i in (1, 2, 3)
        ]
        uni, _, _ = model.apply(variables, mods, lengths, infer_mode=-1)
        np.testing.assert_allclose(
            np.asarray(uni),
            np.mean([np.asarray(o) for o in outs], axis=0),
            rtol=1e-4, atol=1e-5,
        )


@pytest.mark.parametrize(
    "script,args",
    [
        ("examples/affect/affect_dyn.py",
         ["--synthetic", "--n-epochs", "1", "--freeze", "--reg", "0.01"]),
        ("examples/affect/affect_mm.py",
         ["--synthetic", "--n-epochs", "1", "--fusion", "5"]),
    ],
)
def test_affect_cli_smoke(tmp_path, script, args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["DYNMM_FORCE_CPU"] = "1"
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1100,
    )
    assert result.returncode == 0, result.stderr[-3000:]
