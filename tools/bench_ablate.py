#!/usr/bin/env python
"""Ablation microbench for the fused sweep kernels (real TPU).

Replaces individual cost centers of the sweep kernels with cheap
stand-ins (WRONG physics — timing only) to attribute the wall clock:

  full        unmodified kernels (baseline)
  no-planck   Planck radiance -> linear map (removes 1 exp + 2 div/layer)
  no-coupler  two_stream_couplers -> affine stand-in (removes sqrt,
              exp, ~5 div/layer; keeps the same flux data flow)
  no-sums     quadrature reductions -> constant stores
  no-kappa    in-kernel kappa contraction -> first table row broadcast

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_ablate.py
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

    import frei_tpu.ops.sweep_pallas as sp
    from frei_tpu import Grid, Planet, load_example_opacity
    from frei_tpu.ops.twostream import TwoStreamCouplers
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
    cfg = SolverConfig(n_timesteps=N_ITERS, n_zero_crossings=10 ** 6,
                       convergence_dT=0.0, engine="pallas")

    real_planck = sp._planck_row
    real_couplers = sp.two_stream_couplers_g0
    real_unpack = sp._unpack

    def fake_planck(c1, lam, T_col):
        return c1 * T_col

    def fake_couplers(dtau, om, B1, B2, expm1=None):
        t = 1.0 - dtau
        return TwoStreamCouplers(a=t, b=om * 0.1,
                                 s_up=B1 * dtau, s_down=B2 * dtau)

    def unpack_nokappa(refs, fused):
        out = list(real_unpack(refs, fused))
        if fused:
            tab_ref = refs[4]
            sig = out[7]

            def k_row(l):
                return tab_ref[l][0, :][None, :] + sig
            out[3] = k_row
        return tuple(out)

    variants = {
        "full": {},
        "no-planck": {"_planck_row": fake_planck},
        "no-coupler": {"two_stream_couplers_g0": fake_couplers},
        "no-kappa": {"_unpack": unpack_nokappa},
        "no-planck+coupler": {"_planck_row": fake_planck,
                              "two_stream_couplers_g0": fake_couplers},
    }

    total = N_COLUMNS * N_BINS * N_ITERS
    for name, patches in variants.items():
        for attr, fn in patches.items():
            setattr(sp, attr, fn)
        try:
            jax.clear_caches()
            r = solve_rc_batched(T0, *args, cfg)
            jax.block_until_ready(r.flux)
            t0 = time.perf_counter()
            for _ in range(3):
                r = solve_rc_batched(T0, *args, cfg)
                jax.block_until_ready(r.flux)
            wall = (time.perf_counter() - t0) / 3
            print(f"{name:20s} {wall:7.4f} s  "
                  f"{total / wall / 1e6:7.1f} M elem-iters/s")
        except Exception as e:
            print(f"{name:20s} FAILED {str(e)[:110]}")
        finally:
            sp._planck_row = real_planck
            sp.two_stream_couplers_g0 = real_couplers
            sp._unpack = real_unpack


if __name__ == "__main__":
    main()
