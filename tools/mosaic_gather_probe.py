"""Mosaic feasibility probe: per-column dynamic row gather in VMEM.

The algorithmic alternative to the in-kernel kappa dot is a direct
lerp: ``kappa[c, l] = (1-f) tab[l, ti[c,l]] + f tab[l, ti[c,l]+1]`` —
2 FMAs per output element instead of a K-wide contraction (K = 30 on
the headline config).  That needs per-(column, layer) DYNAMIC row
loads from a VMEM-resident (K, W) table.  This probe checks what this
Mosaic version can lower, and at what cost:

  probe 1: ``pl.load(tab_ref, (l, pl.ds(idx, 1), :))`` with a traced
           scalar idx read from SMEM — single dynamic sublane slice;
  probe 2: the full per-column loop (bc dynamic slices per layer)
           fused into a sweep-shaped loop, timed against the dot.

Usage (TPU host): python tools/mosaic_gather_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

L, K, W, BC = 30, 32, 512, 8


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # ---- probe 1: one dynamic sublane slice ---------------------------
    def k1(idx_ref, tab_ref, o_ref):
        i = idx_ref[0]
        row = tab_ref[pl.ds(i, 1), :]           # dynamic sublane slice
        o_ref[:, :] = row

    tab = jnp.asarray(np.random.RandomState(0).rand(K, W), jnp.float32)
    idx = jnp.asarray([7], jnp.int32)
    try:
        out = pl.pallas_call(
            k1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
        )(idx, tab)
        ok = bool(np.allclose(np.asarray(out)[0], np.asarray(tab)[7]))
        print(f"probe 1 (dynamic sublane slice): compiles, correct={ok}")
    except Exception as e:  # noqa: BLE001 - feasibility probe
        print(f"probe 1 (dynamic sublane slice): FAILS -> "
              f"{type(e).__name__}: {str(e)[:300]}")
        return

    # ---- probe 2: sweep-shaped lerp gather vs dot ----------------------
    # per grid step: loop L layers x BC columns of 2 dynamic row loads
    # + lerp, vs one batched (L, BC, K) x (L, K, W) dot.
    def lerp_kernel(ti_ref, tf_ref, tab_ref, o_ref):
        for l in range(L):
            rows = []
            for c in range(BC):
                i = ti_ref[c, l]
                lo = tab_ref[l, pl.ds(i, 1), :]
                hi = tab_ref[l, pl.ds(i + 1, 1), :]
                f = tf_ref[c, l]
                rows.append(lo * (1.0 - f) + hi * f)
            o_ref[:, l, :] = jnp.concatenate(rows, axis=0)

    def dot_kernel(ohs_ref, tab_ref, o_ref):
        kk = jax.lax.dot_general(
            ohs_ref[:], tab_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        o_ref[:, :, :] = jnp.moveaxis(kk, 0, 1)

    rng = np.random.RandomState(1)
    tabL = jnp.asarray(rng.rand(L, K, W), jnp.float32)
    ti = jnp.asarray(rng.randint(0, K - 1, (BC, L)), jnp.int32)
    tf = jnp.asarray(rng.rand(BC, L), jnp.float32)
    ohs = jnp.asarray(rng.rand(L, BC, K), jnp.float32)
    n_steps = 512

    def time_call(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            walls.append(time.perf_counter() - t0)
        return min(walls), out

    lerp = jax.jit(lambda a, b, t: pl.pallas_call(
        lerp_kernel,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((BC, L), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((BC, L), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((L, K, W), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BC, L, W), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BC, L, W), jnp.float32),
    )(a, b, t))
    dot = jax.jit(lambda o, t: pl.pallas_call(
        dot_kernel,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((L, BC, K), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((L, K, W), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BC, L, W), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BC, L, W), jnp.float32),
    )(o, t))

    try:
        tl, _ = time_call(lerp, ti, tf, tabL)
        print(f"probe 2 lerp-gather: {tl * 1e3:.2f} ms "
              f"({n_steps} x (L={L}, bc={BC}) blocks)")
    except Exception as e:  # noqa: BLE001
        print(f"probe 2 lerp-gather: FAILS -> "
              f"{type(e).__name__}: {str(e)[:300]}")
        tl = None
    td, _ = time_call(dot, ohs, tabL)
    print(f"probe 2 batched dot: {td * 1e3:.2f} ms")
    if tl is not None:
        print(f"lerp/dot ratio: {tl / td:.2f}x")


if __name__ == "__main__":
    main()
