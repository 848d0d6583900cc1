"""Execute the multi-host path for real: 2 OS processes, a coordinator on
localhost, one global ('data','model') mesh — one DP+TP train step and one
TP-sharded serving solve (VERDICT #4; replaces the reference's Accelerate DDP
contract, ``model/trainer.py:53-65``, which it only ever exercises through
torchrun)."""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


import pytest


# 4 processes subsumes the 2-process case (same launcher/mesh machinery
# with strictly more coordination) — one case keeps suite wall-time down
@pytest.mark.parametrize("n_proc", [4])
@pytest.mark.slow
def test_multiprocess_dp_tp_train_and_serve(n_proc):
    port = _free_port()
    procs = []
    for pid in range(n_proc):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES=str(n_proc),
            PROCESS_ID=str(pid),
            PALLAS_AXON_POOL_IPS="",  # keep the axon sitecustomize inert
            PYTHONPATH=os.path.dirname(os.path.dirname(WORKER)),
        )
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, out[-4000:]
    # both hosts computed the same (replicated) loss
    losses = {line.split("loss=")[1] for out in outs for line in out.splitlines()
              if "MULTIHOST_OK" in line}
    assert len(losses) == 1, losses
