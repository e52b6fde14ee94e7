"""Kappa-staging layout experiment matrix (real TPU).

Round-5 bounded experiment (VERDICT r4 #2): the in-solve decomposition
attributes ~0.067 s of the 0.367 s headline wall (18%) to kappa
contraction STAGING — operand layout for the (L, bc, K) batched dot,
table sublane addressing, accumulator setup — the only block that is
neither arithmetic nor physics.  This tool measures the candidate
layout attacks INSIDE the full headline solve:

* ``ohs=layer``   — weight slab built directly in the kernel's
                    (L, B, K) layer-major layout (kills the per-sweep
                    XLA moveaxis; tables.layer_interp_weights);
* ``dot=padk32``  — K zero-padded to a multiple of 32 (sublane-aligns
                    the table's contraction axis at 1/4 the FMA cost
                    of padk's 128);
* ``dot=tabT``    — pre-transposed (L, W, K) table, contraction over
                    the minor axis of both operands;
* combinations of the above.

All variants are numerically exact (padk32/layer bit-identical;
tabT reorders the K-sum).  Prints one JSON line per configuration for
the committed matrix in docs/design-notes.md.

Usage (on the TPU host):
    python tools/staging_matrix.py [--iters 20]
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

CONFIGS = [
    ("batch", "batched"),     # production
    ("layer", "batched"),     # kill the moveaxis
    ("batch", "padk32"),      # sublane-align K
    ("batch", "tabT"),        # lane-axis contraction
    ("layer", "padk32"),
    ("layer", "tabT"),
]


def main():
    ap = argparse.ArgumentParser()
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
        # layouts/modes are trace-time module state, not part of the
        # jit cache key — clear before every configuration
        jax.clear_caches()
        t0 = time.perf_counter()
        res = fn(T0)
        jax.block_until_ready(res.flux)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = fn(T0)
            jax.block_until_ready(res.flux)
            walls.append(time.perf_counter() - t0)
        return min(walls), compile_s, np.asarray(res.flux)

    results = []
    ref_flux = None
    for layout, mode in CONFIGS:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sp.set_ohs_layout(layout)
            sp.set_kappa_dot_mode(mode)
        try:
            wall, compile_s, flux = run()
        finally:
            sp.set_ohs_layout("batch")
            sp.set_kappa_dot_mode("batched")
        if ref_flux is None:
            ref_flux = flux
            rel = 0.0
        else:
            rel = float(np.abs(flux - ref_flux).max()
                        / np.abs(ref_flux).max())
        row = {"ohs": layout, "dot": mode, "wall_s": round(wall, 4),
               "columns_bins_per_s": round(N_COLUMNS * N_BINS / wall),
               "compile_s": round(compile_s, 1),
               "max_rel_vs_production": rel,
               "finite": bool(np.all(np.isfinite(flux)))}
        results.append(row)
        print(json.dumps(row), flush=True)

    print("\nohs     dot      wall[s]   Mcols*bins/s  rel_vs_prod")
    for r in results:
        print(f"{r['ohs']:<7} {r['dot']:<8} {r['wall_s']:.4f}   "
              f"{r['columns_bins_per_s'] / 1e6:>8.2f}      "
              f"{r['max_rel_vs_production']:.2e}")


if __name__ == "__main__":
    main()
