"""Standalone VPU peak microbenchmark — a DOCUMENTED NEGATIVE RESULT.

This was meant to measure the achievable f32 FMA throughput with a
register-resident Pallas kernel, as the occupancy denominator for the
sweep kernels.  It cannot work on this stack, in two instructive ways
(measured, docs/design-notes.md "Microbenchmark warning"):

1. An affine chain (``v <- a*v + b``) composes algebraically and the
   compiler folds the whole unroll into one FMA (this tool originally
   reported an absurd 867 TFLOP/s).  The chain below is non-affine
   (``v <- v + c*v*v``) to defeat that — necessary but not
   sufficient:
2. Even the non-affine chain times at ~0.03 ms wall FLAT in the loop
   count (256 -> 8192 trips) — standalone pallas_call timings
   through this tunnel never reflect kernel execution.

The real occupancy denominator therefore comes from INSIDE the
production solve: the `padk` marginal-K experiment in
tools/kappa_matrix.py measures 5.1e12 FMA/s in-kernel (98 extra
zero FMAs per element cost +0.092 s).  This file is kept as the
reproducer for the two failure modes above.

Kernel shape notes: 8 independent (8, 512) chains give the VPU enough
ILP to hide FMA latency; the chain is deliberately NON-AFFINE
(``v <- v + c*v*v``: one mul + one FMA per step) because an affine
``v <- a*v + b`` chain composes algebraically and Mosaic folds the
entire unroll into a single FMA (measured: an affine variant of this
kernel reported an absurd 867 TFLOP/s).  Values stay ~1e-3 so the
quadratic term never overflows.  The fori_loop carries no vectors
(Mosaic rejects loop-carried vectors) — state round-trips through a
VMEM scratch ref once per UNROLL steps, amortizing the traffic to
nothing.

Usage (TPU host): python tools/vpu_peak.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROWS = 64          # 8 independent 8-sublane chains
LANES = 512
UNROLL = 64        # FMAs per scratch round-trip
LOOP = 256         # fori_loop trips
GRID = 16          # pallas grid steps


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref, scratch):
        scratch[:, :] = x_ref[:, :]

        def body(i, _):
            v = scratch[:, :]
            for k in range(UNROLL):
                # non-affine: v + c*v*v cannot be folded across steps
                # (c alternates sign so v stays bounded near 1e-3)
                c = 0.5 if k % 2 == 0 else -0.5
                v = v + c * (v * v)
            scratch[:, :] = v
            return 0

        jax.lax.fori_loop(0, LOOP, body, 0)
        o_ref[:, :] = scratch[:, :]

    x = jnp.full((GRID * ROWS, LANES), 1e-3, jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID * ROWS, LANES),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.float32)],
        )(x)

    out = run(x)
    jax.block_until_ready(out)
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(x)
        jax.block_until_ready(out)
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    # per element-step: one mul + one FMA = 2 vector ops, 3 FLOPs
    steps = float(GRID * ROWS * LANES) * UNROLL * LOOP
    print(f"wall {wall * 1e3:.3f} ms   "
          f"sustained {3.0 * steps / wall / 1e12:.3f} TFLOP/s f32   "
          f"{2.0 * steps / 1024 / wall / 1e9:.3f} Gvec-instr/s "
          f"(1024-lane f32 ops)")


if __name__ == "__main__":
    main()
