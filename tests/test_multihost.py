"""Multi-host data parallelism: 2-process jax.distributed run on CPU.

SURVEY.md §2.3/§5.8 names multi-host DP over DCN as the TPU-native
capability to deliver beyond the reference's single-process multi-GPU
decorator (netinterface.py:472-515).  This launches two OS processes, each
with 2 virtual CPU devices, joined into one 4-device jax.distributed
cluster (Gloo collectives); each process loads only its per-process data
shard (data.loader shard_id/num_shards) and the train step runs over the
global mesh.  The loss must equal a single-process 2-device control run on
the same (deterministic) data.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _loss_from(out: str) -> float:
    m = re.search(r"MULTIHOST_LOSS ([0-9.eE+-]+)", out)
    assert m, f"worker produced no loss line:\n{out[-2000:]}"
    return float(m.group(1))


def _env():
    env = dict(os.environ)
    # children set their own XLA_FLAGS / platform inside the worker
    env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_env()) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    losses = [_loss_from(o) for o in outs]
    assert np.isclose(losses[0], losses[1], rtol=1e-6), losses

    ctrl = subprocess.run(
        [sys.executable, WORKER, "0", "1", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_env(), timeout=900)
    assert ctrl.returncode == 0, ctrl.stdout[-3000:]
    control = _loss_from(ctrl.stdout)
    # same global batch, different device/process partitioning: identical
    # up to float reduction order
    assert np.isclose(losses[0], control, rtol=1e-5), (losses, control)
