"""Multi-host integration: 2 jax.distributed CPU processes (4 virtual
devices each) form one 8-device mesh and train through BatchLoader's
per-process-rows branch (``data/loader.py``), with loss parity against the
single-process 8-device run.

This is the only distributed branch the single-process suite cannot reach —
the reference equivalent is DataParallel (``src/train.py:83-85``) scaled
past one host.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(num_procs: int, tmp: str):
    port = _free_port()
    procs = []
    for pid in range(num_procs):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, f"127.0.0.1:{port}",
             str(num_procs), str(pid), tmp],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    return outs


def _parse_losses(out: str):
    for line in out.splitlines():
        if line.startswith("LOSSES "):
            return [float(v) for v in line.split()[1:]]
    raise AssertionError(f"no LOSSES line in:\n{out}")


def test_two_process_training_matches_single_process(tmp_path):
    tmp2 = str(tmp_path / "two")
    os.makedirs(tmp2)
    outs = _run_workers(2, tmp2)
    losses2 = [_parse_losses(o) for o in outs]
    # both processes observe identical global losses
    np.testing.assert_allclose(losses2[0], losses2[1], rtol=0, atol=0)

    # single-process reference run over the same corpus geometry
    tmp1 = str(tmp_path / "one")
    os.makedirs(tmp1)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    port = _free_port()
    p = subprocess.run(
        [sys.executable, WORKER, f"127.0.0.1:{port}", "1", "0", tmp1, "8"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert p.returncode == 0, f"single-proc worker failed:\n{p.stdout}\n{p.stderr}"
    losses1 = _parse_losses(p.stdout)

    assert len(losses1) == len(losses2[0]) == 2
    np.testing.assert_allclose(losses2[0], losses1, rtol=1e-5, atol=1e-6)
