#!/usr/bin/env python
"""Resort-rebin throughput across engines (BASELINE config 2).

Times the grouped-trapezoid rebin of a synthetic high-resolution
opacity cube onto an R~500 grid — the reference's numba hot loop
(`/root/reference/frei/interp.py:156-202`) — for each engine:

  xla     jax segment-sum kernel (CPU or TPU)
  pallas  Pallas TPU kernel (TPU only)
  native  threaded C++ (std::thread) kernel, built on first use

Run: PYTHONPATH=. python tools/bench_rebin.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_HR = 1_000_000       # high-res samples (DACE cubes: ~1e6-1e7 / bin file)
N_ROWS = 16            # (T, P) rows per chunk
N_BINS = 500


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = np.linspace(0.3, 30.0, N_HR)
    rows = rng.rand(N_ROWS, N_HR).astype(np.float32)
    edges = np.geomspace(0.5, 10.0, N_BINS + 1)

    def timed(fn, n=5):
        fn()                      # warm-up / compile / build
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n

    results = {}

    from frei_tpu.ops.rebin import resort_rebin
    xr = jnp.asarray(rows)
    xx = jnp.asarray(x, jnp.float32)
    xe = jnp.asarray(edges, jnp.float32)
    f = jax.jit(lambda: resort_rebin(xr, xx, xe))
    results["xla"] = timed(lambda: jax.block_until_ready(f()))

    if jax.default_backend() in ("tpu", "axon"):
        from frei_tpu.ops.rebin_pallas import resort_rebin_pallas
        g = jax.jit(lambda: resort_rebin_pallas(xr, xx, xe))
        try:
            results["pallas"] = timed(lambda: jax.block_until_ready(g()))
        except Exception as e:
            print("pallas engine failed:", str(e)[:80])

    from frei_tpu.native import grouped_trapezoid_native
    try:
        results["native"] = timed(
            lambda: grouped_trapezoid_native(rows, x, edges))
    except Exception as e:
        print("native engine failed:", str(e)[:80])

    total = N_ROWS * N_HR
    print(f"backend={jax.default_backend()}  "
          f"{N_ROWS} rows x {N_HR:,} samples -> {N_BINS} bins")
    for name, wall in results.items():
        print(f"  {name:8s} {wall*1e3:8.2f} ms   "
              f"{total/wall/1e9:6.2f} Gsamples/s")


if __name__ == "__main__":
    main()
