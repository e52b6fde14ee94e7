"""Fused opacity-lookup kernel (Pallas TPU).

The XLA kappa path builds the (points, nT*nP) bilinear one-hot weight
matrix in HBM and contracts it with the opacity table
(``opacity.tables._interp_tp_onehot``) — the weight matrix alone is
~2x the size of the kappa output it produces.  This kernel builds the
one-hot tile *in VMEM registers* (four iota-compares), keeps the whole
(nT*nP, species*W) table resident in VMEM across grid steps, runs the
contraction on the MXU at float32 precision, and folds the
mass-mixing-ratio species sum and the Rayleigh sigma add into the same
pass.  HBM traffic: read the (points,) index/weight vectors + write
the (points, W) kappa block — the output is the only large array that
ever touches HBM.

Numerics match the gather-based ``interp_tp`` + ``kappa_from_stack``
up to float32 summation order (~1e-7 relative; cross-checked in
``tests/test_sweep_pallas.py``): linear inside the (T, P) hull,
molecular opacity exactly zero outside (`/root/reference/frei/
opacity.py:241-263`), total = sum_s MMR_s * interp_s + sigma
(`opacity.py:265-268`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["kappa_pallas", "kappa_pallas_applicable"]

#: point-tile size (sublane axis of the one-hot tile)
_BN = 256
#: VMEM budget for the resident table [bytes]
_TABLE_BYTES_MAX = 10 * 1024 * 1024


def kappa_pallas_applicable(stack, n_points: int) -> bool:
    """The kernel needs a T axis to interpolate, a table that fits
    VMEM, and enough points to fill tiles."""
    S, nT, nP, W = stack.values.shape
    return (nT > 1 and n_points >= _BN
            and 4 * nT * nP * S * W <= _TABLE_BYTES_MAX)


def _kernel(idx_ref, wts_ref, mmr_ref, mask_ref, tab_ref, sig_ref,
            out_ref, *, nP, S, W, M):
    bn = out_ref.shape[0]
    idx = idx_ref[:, :]                                   # (bn, 1) int32
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, M), 1)
    oh = jnp.where(col == idx, wts_ref[:, 0:1], 0.0)
    oh = oh + jnp.where(col == idx + 1, wts_ref[:, 1:2], 0.0)
    oh = oh + jnp.where(col == idx + nP, wts_ref[:, 2:3], 0.0)
    oh = oh + jnp.where(col == idx + nP + 1, wts_ref[:, 3:4], 0.0)
    acc = None
    for s in range(S):
        vals = jnp.dot(oh, tab_ref[:, s * W:(s + 1) * W],
                       preferred_element_type=tab_ref.dtype,
                       precision=jax.lax.Precision.HIGHEST)
        term = mmr_ref[:, s:s + 1] * vals
        acc = term if acc is None else acc + term
    out_ref[:, :] = mask_ref[:, :] * acc + sig_ref[0, :][None, :]


def kappa_pallas(stack, mmr, temperature, pressure_cgs, sigma_scat,
                 interpret: bool = False):
    """Total opacity for batched lookup points via the fused kernel.

    Parameters mirror ``opacity.tables.kappa_from_stack``:
    ``temperature``/``pressure_cgs`` broadcast to a batch shape B,
    ``mmr`` is (S,) + B, ``sigma_scat`` is (W,).  Returns
    (B + (W,), sigma_scat).
    """
    from ..opacity.tables import _axis_weights

    values = stack.values                       # (S, nT, nP, W)
    S, nT, nP, W = values.shape
    M = nT * nP
    dtype = values.dtype

    temperature, pressure_cgs = jnp.broadcast_arrays(
        jnp.asarray(temperature), jnp.asarray(pressure_cgs))
    B = temperature.shape
    N = 1
    for d in B:
        N *= d

    ti, tf, t_ok = _axis_weights(stack.temps, temperature)
    pj, pf, p_ok = _axis_weights(stack.press_cgs, pressure_cgs)
    i00 = (ti * nP + pj).reshape(N, 1).astype(jnp.int32)
    tf = tf.reshape(N)
    pf = pf.reshape(N)
    wts = jnp.stack([(1 - tf) * (1 - pf), (1 - tf) * pf,
                     tf * (1 - pf), tf * pf], axis=1).astype(dtype)
    mask = (t_ok & p_ok).reshape(N, 1).astype(dtype)
    mmr_pts = jnp.moveaxis(mmr.reshape((S, N)), 0, 1).astype(dtype)

    pad = (-N) % _BN
    if pad:
        i00 = jnp.pad(i00, ((0, pad), (0, 0)))
        wts = jnp.pad(wts, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        mmr_pts = jnp.pad(mmr_pts, ((0, pad), (0, 0)))
    Np = N + pad

    flat = jnp.moveaxis(values.reshape(S, M, W), 0, 1).reshape(M, S * W)
    sig_row = sigma_scat[None, :]

    def row_spec(width):
        return pl.BlockSpec((_BN, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_kernel, nP=nP, S=S, W=W, M=M),
        grid=(Np // _BN,),
        in_specs=[
            row_spec(1), row_spec(4), row_spec(S), row_spec(1),
            pl.BlockSpec((M, S * W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=row_spec(W),
        out_shape=jax.ShapeDtypeStruct((Np, W), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(i00, wts, mmr_pts, mask, flat, sig_row)
    return out[:N].reshape(B + (W,)), sigma_scat
