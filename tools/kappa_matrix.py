"""Kappa-contraction lowering experiment matrix (real TPU).

The round-2 ablation showed the fused sweep kernels spend ~26% of the
headline-bench wall in the in-kernel kappa contraction
((L, bc, K) x (L, K, W), K = species * nT = 30, W = 500), executing at
vector-FMA rate rather than on the MXU.  This tool measures every
lowering variant implemented behind
``frei_tpu.ops.sweep_pallas.set_kappa_dot_mode`` INSIDE the full
headline solve (standalone pallas_call timings are unreliable on this
stack) and cross-checks flux parity against the production "batched"
mode.

Usage (on the TPU host):
    python tools/kappa_matrix.py [--modes batched,perlayer,...]
                                 [--blocks 8,16,32] [--iters 20]

Prints one human table plus one JSON line per configuration for the
committed experiment matrix in docs/design-notes.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_COLUMNS = 8192
N_BINS = 500
N_LAYERS = 30

# bf16 truncates the interp weights/tables to 8 mantissa bits -> ~1e-3
# relative kappa error; it exists as a perf-ceiling datapoint only.
PARITY_RTOL = {"bf16": 5e-2}
DEFAULT_RTOL = 5e-4   # float32 converged-state spread across lowerings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="batched,perlayer,padk,bf16x2,bf16")
    ap.add_argument("--blocks", default="8")
    ap.add_argument("--iters", type=int, default=20)
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

    results = []
    ref_flux = None
    for bc in [int(b) for b in args.blocks.split(",")]:
        for mode in args.modes.split(","):
            sp.set_kappa_dot_mode(mode)
            # _KAPPA_DOT_MODE is read at trace time and is NOT part of
            # the jit cache key — the clear_cache() below is what
            # forces a fresh lowering per mode; without it every mode
            # after the first silently re-times the first lowering
            cfg = SolverConfig(n_timesteps=args.iters,
                               n_zero_crossings=10 ** 6,
                               convergence_dT=0.0,
                               engine="pallas", block_columns=bc)
            fn = partial(solve_rc_batched, consts=grid._consts,
                         params=planet.physics_params(),
                         kappa_all=grid._kappa_fn, cfg=cfg)
            solve_rc_batched.clear_cache()
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
            wall = min(walls)
            flux = np.asarray(res.flux)
            ok = bool(np.all(np.isfinite(flux)))
            rel = None
            if mode == "batched" and ref_flux is None:
                ref_flux = flux
            if ref_flux is not None:
                rel = float(np.abs(flux - ref_flux).max()
                            / np.abs(ref_flux).max())
                ok = ok and rel < PARITY_RTOL.get(mode, DEFAULT_RTOL)
            row = {"mode": mode, "block_columns": bc,
                   "wall_s": round(wall, 4),
                   "columns_bins_per_s": round(N_COLUMNS * N_BINS / wall),
                   "compile_s": round(compile_s, 1),
                   "max_rel_vs_batched": rel, "parity_ok": ok}
            results.append(row)
            print(json.dumps(row), flush=True)
            sp.set_kappa_dot_mode("batched")

    print("\nmode        bc  wall[s]   Mcols*bins/s  rel_err")
    for r in results:
        rel = ("-" if r["max_rel_vs_batched"] is None
               else f"{r['max_rel_vs_batched']:.2e}")
        print(f"{r['mode']:<11} {r['block_columns']:>3}  "
              f"{r['wall_s']:.4f}   "
              f"{r['columns_bins_per_s'] / 1e6:>8.2f}      {rel}")


if __name__ == "__main__":
    main()
