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

import pytest

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


@pytest.mark.slow   # 2-process bring-up; the sharded-solve variant
                    # below and the dryrun cross-process leg cover it
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


_SOLVE_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from frei_tpu import Grid, Planet, load_example_opacity
from frei_tpu.parallel import initialize_distributed, make_mesh, \
    solve_ensemble
from frei_tpu.rt.solver import SolverConfig, solve_rc

addr, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(addr, num_processes=2, process_id=pid)
assert jax.device_count() == 4

planet = Planet.from_hot_jupiter()
grid = Grid(planet, n_wl_bins=16, n_layers=6, T_ref=2400.0,
            dtype=jnp.float64)
grid.load_opacities(opacities=load_example_opacity(
    grid, scale_factor=1.0, dtype=jnp.float64))
rng = np.random.RandomState(3)
T0 = (np.asarray(grid.init_temperatures)[None, :]
      * rng.uniform(0.9, 1.1, (8, 1)))
cfg = SolverConfig(n_timesteps=3)

# independent single-column references, computed locally on every
# process (replicated inputs — no collectives involved)
ref_flux = np.stack([
    np.asarray(solve_rc(jnp.asarray(T0[c]), grid._consts,
                        planet.physics_params(), grid._kappa_fn,
                        cfg).flux)
    for c in range(8)])

for mesh_shape in [(4, 1), (2, 2)]:
    mesh = make_mesh(*mesh_shape)           # global 2-process mesh
    res = solve_ensemble(jnp.asarray(T0), grid._consts,
                         planet.physics_params(), grid.opacities,
                         grid.chemistry, cfg, mesh=mesh)
    # each process checks the shards it can address against the
    # locally recomputed per-column references
    n_checked = 0
    for sh in res.flux.addressable_shards:
        got = np.asarray(sh.data)
        want = ref_flux[sh.index]
        np.testing.assert_allclose(got, want, rtol=1e-9,
                                   err_msg=f"mesh={mesh_shape}")
        n_checked += got.size
    assert n_checked > 0
    print(f"WORKER-SOLVE-OK {pid} mesh={mesh_shape} "
          f"checked={n_checked}")
"""


@pytest.mark.slow   # spawns 2 jax.distributed processes
def test_two_process_sharded_solve():
    """A REAL cross-process solve: both controllers build the global
    ('columns', 'bins') mesh over all 4 devices, run ``solve_ensemble``
    on a tiny config (columns sharded across processes; the (2, 2)
    mesh also exercises the bins-axis bolometric psum), and every
    process verifies its addressable result shards against locally
    recomputed single-column solves."""
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, PYTHONPATH=str(REPO))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SOLVE_WORKER, addr, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(REPO))
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"WORKER-SOLVE-OK {pid} mesh=(4, 1)" in out, out
        assert f"WORKER-SOLVE-OK {pid} mesh=(2, 2)" in out, out
