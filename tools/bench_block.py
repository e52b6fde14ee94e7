#!/usr/bin/env python
"""Sweep-kernel block-size / variant microbench on the real TPU.

Times the full fixed-horizon batched solve (bench.py workload) for a
range of ``SolverConfig.block_columns`` values.  Run on the chip:

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_block.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_COLUMNS = 8192
N_BINS = 500
N_LAYERS = 30
N_ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from frei_tpu import Grid, Planet, load_example_opacity
    from frei_tpu.rt.solver import SolverConfig, solve_rc_batched

    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=N_BINS, n_layers=N_LAYERS,
                T_ref=2400.0, dtype=jnp.float32)
    grid.load_opacities(opacities=load_example_opacity(
        grid, scale_factor=1.0, dtype=jnp.float32))
    rng = np.random.RandomState(0)
    base = np.asarray(grid.rt_grid.init_temperatures)
    T0 = jnp.asarray(base[None, :] * rng.uniform(0.95, 1.05,
                                                 (N_COLUMNS, 1)),
                     jnp.float32)
    args = (grid._consts, planet.physics_params(), grid._kappa_fn)

    total = N_COLUMNS * N_BINS * N_ITERS
    for bc in [int(v) for v in (sys.argv[1:] or [8, 16, 32, 64, 128])]:
        cfg = SolverConfig(n_timesteps=N_ITERS,
                           n_zero_crossings=10 ** 6,
                           convergence_dT=0.0, engine="pallas",
                           block_columns=bc)
        try:
            r = solve_rc_batched(T0, *args, cfg)
            jax.block_until_ready(r.flux)
            t0 = time.perf_counter()
            for _ in range(3):
                r = solve_rc_batched(T0, *args, cfg)
                jax.block_until_ready(r.flux)
            wall = (time.perf_counter() - t0) / 3
            assert bool(np.isfinite(np.asarray(r.flux)).all())
            print(f"bc={bc:4d}: {wall:7.4f} s  "
                  f"{total / wall / 1e6:7.2f} M cols*bins/s")
        except Exception as e:
            print(f"bc={bc:4d}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
