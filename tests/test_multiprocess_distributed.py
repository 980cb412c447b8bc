"""Two-process ``jax.distributed`` validation of the multi-host feed
(SURVEY §5.8, VERDICT r4 item 6).

Everything multi-host had only ever executed with ``process_count == 1``
(ProcessShard simulated the index arithmetic; ``make_global_batch``
degenerated to ``shard_batch``). This drive spawns TWO real CPU processes
joined through ``jax.distributed.initialize`` (4 local devices each → an
8-device global mesh) and runs one data-parallel train epoch through
``SegTrainer`` with each process feeding only its own ``ProcessShard``
slice via ``jax.make_array_from_process_local_data`` — the production
multi-host path, now with real cross-process assembly.

Replica invariant: with params replicated over 'data', both processes
must report the identical loss and post-epoch param checksum.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # subprocess drive with fresh jax compiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_epoch():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # fresh processes must not inherit a TPU grab; the child also forces
    # the CPU backend itself before distributed init
    env["DYNMM_FORCE_CPU"] = "1"
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD,
             "--coordinator", f"localhost:{port}",
             "--process_id", str(i)],
            env=env, cwd=REPO, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
    results = {}
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert len(lines) == 1, out[-4000:]
        fields = dict(kv.split("=") for kv in lines[0].split()[1:])
        results[int(fields["process"])] = (fields["loss"],
                                           fields["checksum"])
    assert set(results) == {0, 1}
    # data-parallel replicas: identical loss and identical params
    assert results[0] == results[1], results
