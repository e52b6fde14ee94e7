"""Planck-evaluation lowering experiment matrix (real TPU).

Round-4 bounded experiment (VERDICT r3 #4): the fused sweep kernel is
VPU-transcendental-bound and the kappa contraction was measured
MXU-unreachable on this Mosaic version (tools/kappa_matrix.py).  The
per-layer Planck row (one expm1_series + divide over (bc, W)) is the
next transcendental block; since lambda is static, B(T, lambda) can be
a precomputed (nT, W) log-T table evaluated in-kernel as a one-hot
T-contraction (``set_planck_mode('table', n)``) — exp moves from the
VPU into a dot.  This tool measures that variant INSIDE the full
headline solve at several table sizes, against the production direct
path, and records single-run flux deviation.

Context for reading the numbers: the round-2 ablation attributes only
~6% of headline wall to the Planck stage, and linear-in-logT needs
n~8192 for 3e-7-of-peak parity (error scales 1/n^2; 2.8e-5 at 1024) —
so "table" wins only if the contraction genuinely rides the MXU.

Usage (on the TPU host):
    python tools/planck_matrix.py [--sizes 512,1024,2048] [--iters 20]

Prints one JSON line per configuration for the committed experiment
matrix in docs/design-notes.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import warnings
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_COLUMNS = 8192
N_BINS = 500
N_LAYERS = 30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,1024,2048,8192")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--block-columns", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from frei_tpu import Grid, Planet, load_example_opacity
    from frei_tpu.ops import sweep_pallas as sp
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
    cfg = SolverConfig(n_timesteps=args.iters,
                       n_zero_crossings=10 ** 6, convergence_dT=0.0,
                       engine="pallas",
                       block_columns=args.block_columns)
    fn = partial(solve_rc_batched, consts=grid._consts,
                 params=planet.physics_params(),
                 kappa_all=grid._kappa_fn, cfg=cfg)

    def run():
        # the planck mode is trace-time module state, not part of the
        # jit cache key — clear before every configuration
        jax.clear_caches()
        t0 = time.perf_counter()
        res = fn(T0)
        jax.block_until_ready(res.flux)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(4):
            t0 = time.perf_counter()
            res = fn(T0)
            jax.block_until_ready(res.flux)
            walls.append(time.perf_counter() - t0)
        return min(walls), compile_s, np.asarray(res.flux)

    results = []
    wall, compile_s, ref_flux = run()
    row = {"mode": "direct", "n_table": None, "wall_s": round(wall, 4),
           "columns_bins_per_s": round(N_COLUMNS * N_BINS / wall),
           "compile_s": round(compile_s, 1), "max_rel_vs_direct": None}
    results.append(row)
    print(json.dumps(row), flush=True)

    for n in [int(s) for s in args.sizes.split(",")]:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sp.set_planck_mode("table", n)
        try:
            wall, compile_s, flux = run()
        finally:
            sp.set_planck_mode("direct")
        rel = float(np.abs(flux - ref_flux).max()
                    / np.abs(ref_flux).max())
        row = {"mode": "table", "n_table": n, "wall_s": round(wall, 4),
               "columns_bins_per_s": round(N_COLUMNS * N_BINS / wall),
               "compile_s": round(compile_s, 1),
               "max_rel_vs_direct": rel,
               "finite": bool(np.all(np.isfinite(flux)))}
        results.append(row)
        print(json.dumps(row), flush=True)

    print("\nmode    nT     wall[s]   Mcols*bins/s  rel_vs_direct")
    for r in results:
        rel = ("-" if r["max_rel_vs_direct"] is None
               else f"{r['max_rel_vs_direct']:.2e}")
        print(f"{r['mode']:<7} {str(r['n_table']):<6} "
              f"{r['wall_s']:.4f}   "
              f"{r['columns_bins_per_s'] / 1e6:>8.2f}      {rel}")


if __name__ == "__main__":
    main()
