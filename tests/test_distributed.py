"""Multi-process distributed-runtime smoke test.

``frei_tpu.parallel.initialize_distributed`` wraps
``jax.distributed.initialize`` (the real multi-host entry point the
reference's vestigial dask path never delivered, `core.py:22-31`).
Hosted CI has one machine, so this exercises the true multi-controller
path with two local processes on the CPU backend: both processes join
the same coordinator, see each other's devices, and agree on the
global device count.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
from frei_tpu.parallel import initialize_distributed

addr, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(addr, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert jax.device_count() == 4, jax.device_count()   # 2 local x 2 procs
assert len(jax.local_devices()) == 2
print(f"WORKER-OK {pid} global_devices={jax.device_count()}")
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_initialize_distributed():
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, PYTHONPATH=str(REPO))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, addr, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(REPO))
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"WORKER-OK {pid} global_devices=4" in out, out


def test_initialize_distributed_single_process_noop():
    from frei_tpu.parallel import initialize_distributed

    # must not touch jax.distributed at all for a 1-process job
    initialize_distributed(num_processes=1)
    initialize_distributed()
