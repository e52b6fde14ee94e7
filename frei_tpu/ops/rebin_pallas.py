"""Pallas TPU kernel for the resort-rebin grouped trapezoid reduction.

**MEASURED NEGATIVE RESULT — opt-in engine, never chosen by "auto".**
On the round-4 chip session this kernel measured 0.15 Gsamples/s
device-resident vs the plain XLA segment-sum's 72 Gsamples/s (~HBM
roofline) — the one-hot matmul formulation loses to the scatter it
was built to avoid (`docs/opacities.md`).  Kept as a documented
negative result; parity tests live in the slow lane.

TPU-native replacement for the reference's numba ``Trapz`` kernel
(`/root/reference/frei/interp.py:156-202`): instead of a sequential
scalar loop over ~1e6 high-resolution samples per (T, P) table row,
the reduction is expressed as a chunked one-hot matmul that runs on
the MXU:

    out[r, b] = sum_chunks  panels[r, chunk] @ onehot(codes[chunk], b)

with the one-hot matrix materialized per chunk in VMEM (never in HBM:
a full (N, B) one-hot for a 1e6-sample line list would be gigabytes).
Each grid step streams a (TILE_R x CHUNK) panel tile from HBM and
accumulates a (TILE_R x B) partial in the output block; the bandwidth
cost is one pass over the high-res cube, the FLOPs map to the matrix
unit.  Semantics (same-bin pairing, right-closed bins, empty-bin
zeros) are identical to :func:`frei_tpu.ops.rebin.resort_rebin`, which
serves as the cross-check oracle in the tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rebin import bin_codes

__all__ = ["resort_rebin_pallas"]


def _round_up(x, m):
    return (x + m - 1) // m * m


def _rebin_kernel(codes_ref, panels_ref, out_ref, *, n_bins_padded):
    j = pl.program_id(1)
    codes = codes_ref[0, :]                        # (CHUNK,) int32
    bins = jax.lax.broadcasted_iota(
        jnp.int32, (codes.shape[0], n_bins_padded), 1)
    onehot = (codes[:, None] == bins).astype(jnp.float32)
    # HIGHEST precision: the one-hot contraction must not round panel
    # values through bfloat16 (this is ETL for parity-checked tables).
    acc = jax.lax.dot(panels_ref[:], onehot,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@partial(jax.jit, static_argnames=("n_bins", "tile_r", "chunk",
                                   "interpret"))
def _rebin_call(panels, codes, n_bins: int, tile_r: int, chunk: int,
                interpret: bool):
    R, N = panels.shape
    Rp = _round_up(max(R, 1), tile_r)
    Np = _round_up(max(N, 1), chunk)
    Bp = _round_up(n_bins, 128)
    panels = jnp.pad(panels, ((0, Rp - R), (0, Np - N)))
    codes = jnp.pad(codes, (0, Np - N), constant_values=-1)[None, :]

    out = pl.pallas_call(
        partial(_rebin_kernel, n_bins_padded=Bp),
        grid=(Rp // tile_r, Np // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, chunk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, Bp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, Bp), jnp.float32),
        interpret=interpret,
    )(codes, panels)
    return out[:R, :n_bins]


def resort_rebin_pallas(values, x, edges, *, tile_r: int = 128,
                        chunk: int = 512, interpret: bool = False,
                        codes=None, dx=None):
    """Grouped trapezoid rebin of ``values (R, N)`` over ``x (N,)``
    into ``len(edges) - 1`` bins, on the MXU.

    ``interpret=True`` runs the kernel in the Pallas interpreter (for
    CPU tests).  Returns float32 (R, B).  ``codes``/``dx`` accept
    host-float64 precomputations (see ``ops.rebin.bin_codes_np`` —
    float32 coordinates misassign edge-adjacent samples and lose up
    to ~10% per panel width at line-list resolution).
    """
    values = jnp.asarray(values, jnp.float32)
    x = jnp.asarray(x)
    n_bins = int(np.shape(edges)[0] - 1)
    if codes is None:
        codes = bin_codes(x, jnp.asarray(edges, x.dtype))
    left = codes[:-1]
    same = (left == codes[1:]) & (left >= 0)
    dx = ((x[1:] - x[:-1]) if dx is None else jnp.asarray(dx)
          ).astype(jnp.float32)
    panels = 0.5 * (values[:, :-1] + values[:, 1:]) * dx
    panels = jnp.where(same, panels, 0.0)
    seg = jnp.where(same, left, -1).astype(jnp.int32)
    return _rebin_call(panels, seg, n_bins, tile_r, chunk, interpret)
