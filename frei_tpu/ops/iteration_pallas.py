"""Whole-RC-iteration fused kernel (Pallas TPU).

One grid instance = one emit sweep + temperature update + one absorb
sweep + temperature update for a block of columns, entirely in VMEM:

  chemistry (clipped 1-D logT interp of layer-factored ln-MMR tables)
  -> kappa (T-interp weight rows x per-layer opacity tables, MXU)
  -> Planck + two-stream couplers + affine flux recurrence (VPU)
  -> bolometric quadratures -> flux-divergence physics -> dT
  -> repeat for the absorb direction at the updated temperatures.

HBM traffic per iteration: read F_up + F_down + temps, write F_up +
F_down + the three (columns, layers) temperature outputs — nothing
else.  The two-kernel path (``ops.sweep_pallas``) still runs ~2
sweep's worth of XLA glue per iteration between kernels (kappa weight
rows, epilogue physics, convergence selects on the flux slabs); this
kernel removes all of it.

Physics parity: the epilogue calls the SAME ``rt.physics`` functions
on in-VMEM values (scalars g / m_bar / alpha arrive through SMEM);
the sweep bodies are the same formulas as ``ops.sweep_pallas``.
Chemistry/kappa interpolation semantics match the XLA paths: kappa is
zero-filled outside the (T, P) hull (`/root/reference/frei/
opacity.py:241-263`), chemistry tables are clip-interpolated like
``FastChemJAX._vmr_from_table``.

Engine-to-engine agreement is float32 summation order, as for the
sweep kernels (see tests/test_sweep_pallas.py).

DELIBERATE duplication: the per-layer sweep body appears here and in
``ops.sweep_pallas`` (emit/absorb) rather than as one shared helper.
The kernels differ in ref plumbing (block shapes, scratch layout,
masked-write targets, quadrature bookkeeping), and Mosaic lowering is
sensitive to exactly that structure — factoring the body behind an
abstraction measured slower in round-2 experiments and makes lowering
regressions harder to localize.  Drift between the copies is pinned
by the cross-engine parity tests (every engine vs the XLA oracle).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as const
from ..rt import physics
from ..rt.physics import PhysicsParams
from .sweep_pallas import SweepConsts
from .twostream import expm1_series, two_stream_couplers_g0

__all__ = ["IterationPack", "make_iteration_pack", "rc_iteration_pallas",
           "rc_loop_pallas"]


class IterationPack(NamedTuple):
    """Per-configuration device constants for the iteration kernel."""

    sc: SweepConsts          # spectral rows + dtau factors
    k_tgrid: jnp.ndarray     # (1, nT) kappa table temperature grid [K]
    k_tab: jnp.ndarray       # (L, S, nT, W) layer opacity tables
    c_tgrid: jnp.ndarray     # (1, nTc) chemistry log10-T grid
    c_tab: jnp.ndarray       # (L, S, nTc) layer ln-MMR tables
    p1e: jnp.ndarray         # (1, L-1) emit p1 row [barye]
    p2e: jnp.ndarray         # (1, L-1) emit p2 row
    p1a: jnp.ndarray         # (1, L-1) absorb p1 row
    p2a: jnp.ndarray         # (1, L-1) absorb p2 row


def make_iteration_pack(consts, params: PhysicsParams, k_tgrid, k_tab,
                        chem) -> IterationPack:
    from .sweep_pallas import make_sweep_consts

    p = consts.pressures
    dtype = k_tab.dtype
    c_tgrid, c_tab = chem.layer_ln_mmr_tables(p)
    p2e = jnp.concatenate([p[2:], (p[-1] * p[-2] / p[-3])[None]])
    L = p.shape[0]
    nT = jnp.shape(k_tgrid)[0]
    S = k_tab.shape[1] // nT
    return IterationPack(
        sc=make_sweep_consts(consts, params),
        k_tgrid=jnp.asarray(k_tgrid, dtype)[None, :],
        k_tab=k_tab.reshape(L, S, nT, k_tab.shape[-1]),
        c_tgrid=jnp.asarray(c_tgrid, dtype)[None, :],
        c_tab=jnp.moveaxis(jnp.asarray(c_tab, dtype), 1, 2),
        p1e=p[1:][None, :], p2e=p2e[None, :],
        p1a=p[:-1][None, :], p2a=p[1:][None, :],
    )


def _interp_weights(coord_row, x, clip: bool):
    """In-kernel twin of ``opacity.tables._axis_weights`` (clip=False:
    zero-fill weights outside the hull) / the chemistry clip interp
    (clip=True).  ``coord_row`` is a (1, n) VMEM row; ``x`` is
    (bc, 1).  Returns one-hot weight matrix (bc, n)."""
    n = coord_row.shape[1]
    c = coord_row[0, :][None, :]                      # (1, n)
    if clip:
        x = jnp.clip(x, c[0, 0], c[0, n - 1])
    # searchsorted(side='right') on an ascending grid
    i = jnp.sum((x >= c).astype(jnp.int32), axis=1, keepdims=True) - 1
    i = jnp.clip(i, 0, n - 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], n), 1)
    c_lo = jnp.sum(jnp.where(col == i, c, 0.0), axis=1, keepdims=True)
    c_hi = jnp.sum(jnp.where(col == i + 1, c, 0.0), axis=1, keepdims=True)
    f = (x - c_lo) / (c_hi - c_lo)
    if clip:
        ok = 1.0
    else:
        # few-ULP hull tolerance, matching opacity.tables._axis_weights
        eps = 8.0 * jnp.finfo(x.dtype).eps
        lo = c[0, 0] - eps * jnp.abs(c[0, 0])
        hi = c[0, n - 1] + eps * jnp.abs(c[0, n - 1])
        ok = ((x >= lo) & (x <= hi)).astype(x.dtype)
    w_lo = (1.0 - f) * ok
    w_hi = f * ok
    return (jnp.where(col == i, w_lo, 0.0)
            + jnp.where(col == i + 1, w_hi, 0.0))


def _interp_weights_nd(coord, x, clip: bool):
    """N-d twin of :func:`_interp_weights`: ``coord`` is a (n,) row,
    ``x`` is (..., 1); returns one-hot weights (..., n).  Vectorizes
    the weight construction over whole (bc, L) temperature blocks."""
    n = coord.shape[0]
    c = coord[None, None, :]                          # (1, 1, n)
    if clip:
        x = jnp.clip(x, coord[0], coord[n - 1])
    i = jnp.sum((x >= c).astype(jnp.int32), axis=-1, keepdims=True) - 1
    i = jnp.clip(i, 0, n - 2)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape[:-1] + (n,),
                                   x.ndim - 1)
    c_lo = jnp.sum(jnp.where(col == i, c, 0.0), axis=-1, keepdims=True)
    c_hi = jnp.sum(jnp.where(col == i + 1, c, 0.0), axis=-1,
                   keepdims=True)
    f = (x - c_lo) / (c_hi - c_lo)
    if clip:
        ok = 1.0
    else:
        eps = 8.0 * jnp.finfo(x.dtype).eps
        lo = coord[0] - eps * jnp.abs(coord[0])
        hi = coord[n - 1] + eps * jnp.abs(coord[n - 1])
        ok = ((x >= lo) & (x <= hi)).astype(x.dtype)
    w_lo = (1.0 - f) * ok
    w_hi = f * ok
    return (jnp.where(col == i, w_lo, 0.0)
            + jnp.where(col == i + 1, w_hi, 0.0))


def _planck(c1, xrow, T_col):
    # hoisted Planck argument row (see ops.sweep_pallas._planck_row)
    return c1 / expm1_series(xrow * (1.0 / T_col))


_LN10 = 2.302585092994046  # ln(10)


def _kernel(scal_ref, done_ref, temps_ref, fu_ref, fd_ref,
            ktg_ref, ktab_ref, ctg_ref, ctab_ref,
            lam_ref, sig_ref, ftoa_ref, tw_ref,
            dtfe_ref, dtfa_ref, p1e_ref, p2e_ref, p1a_ref, p2a_ref,
            fu_out, fd_out, t1_out, t2_out, dt2_out,
            sums, *, L, S, nT):
    lam = lam_ref[0, :][None, :]
    c1 = 2.0 * const.h * const.c ** 2 / lam ** 5
    xrow = const.hc_over_k / lam
    sig = sig_ref[0, :][None, :]
    tw = tw_ref[0, :][None, :]
    params = PhysicsParams(g=scal_ref[0, 0], m_bar=scal_ref[0, 1],
                           alpha=scal_ref[0, 2], n_dof=scal_ref[0, 3])
    done = done_ref[:, :] > 0.0                       # (bc, 1)

    def kappa_row(oh_T, oh_c, l):
        """kappa for layer l from the one-hot weight matrices:
        per species, ln MMR via a masked row reduction and the
        T-interp contraction against that species' layer table —
        no (bc, S, nT) reshape (a Mosaic relayout that dominated the
        first version of this kernel); + sigma (total opacity,
        `opacity.py:265-268`).  ktab_ref is (L, S, nT, W)."""
        k = None
        for s_i in range(S):
            ln_mmr = jnp.sum(oh_c * ctab_ref[l, s_i, :][None, :],
                             axis=1, keepdims=True)          # (bc, 1)
            mmr = jnp.exp(ln_mmr)
            part = jnp.dot(oh_T, ktab_ref[l, s_i],
                           preferred_element_type=ktab_ref.dtype,
                           precision=jax.lax.Precision.HIGHEST)
            k = part * mmr if k is None else k + part * mmr
        return k + sig

    def weights(T_col):
        oh_T = _interp_weights(ktg_ref, T_col, clip=False)
        logT = jnp.log(T_col) * (1.0 / _LN10)
        oh_c = _interp_weights(ctg_ref, logT, clip=True)
        return oh_T, oh_c

    def epilogue(T1, T2, p1, p2, bu2, bd2, bu1, bd1):
        div, dz = physics.div_bol_net_flux(bu2, bd2, bu1, bd1,
                                           T1, T2, p1, p2, params)
        dt = physics.radiative_timestep(T1, T2, p1, p2, div, dz, params)
        return physics.delta_temperature(div, dt, T1, p1, p2, params)

    temps = temps_ref[:, :]

    # ---- emit sweep (`twostream.py:290-421`) ----
    fu_out[:, 0, :] = fu_ref[:, 0, :]
    fu_out[:, 1, :] = fu_ref[:, 1, :]
    fd_out[:, 0, :] = fd_ref[:, 0, :]
    z = fu_ref[:, 1, :]
    B1 = _planck(c1, xrow, temps[:, 1][:, None])
    sz = None
    for i in range(L - 1):
        l = i + 1
        oh_T, oh_c = weights(temps[:, l][:, None])
        kk = kappa_row(oh_T, oh_c, l)
        dtau = kk * dtfe_ref[0, i]
        om = sig / (sig + kk)
        if i < L - 2:
            B2 = _planck(c1, xrow, temps[:, l + 1][:, None])
            F2d = fd_ref[:, l + 1, :]
        else:
            B2 = B1
            F2d = jnp.broadcast_to(ftoa_ref[0, :][None, :], z.shape)
        cp = two_stream_couplers_g0(dtau, om, B1, B2,
                                    expm1=expm1_series)
        u = z
        z = cp.a * u + (-cp.b * F2d + cp.s_up)
        F1d = cp.a * F2d - cp.b * u + cp.s_down
        if i < L - 2:
            fu_out[:, l + 1, :] = jnp.where(done, fu_ref[:, l + 1, :], z)
        fd_out[:, l, :] = jnp.where(done, fd_ref[:, l, :], F1d)
        su = jnp.sum(u * tw, axis=1) if sz is None else sz
        sz = jnp.sum(z * tw, axis=1)
        sums[:, 0, i] = sz
        sums[:, 1, i] = jnp.sum(F2d * tw, axis=1)
        sums[:, 2, i] = su
        sums[:, 3, i] = jnp.sum(F1d * tw, axis=1)
        B1 = B2

    T1e = temps[:, 1:]
    T2e = jnp.concatenate([temps[:, 2:], temps[:, -1:]], axis=1)
    dT_swept = epilogue(T1e, T2e, p1e_ref[0, :][None, :],
                        p2e_ref[0, :][None, :],
                        sums[:, 0, :], sums[:, 1, :],
                        sums[:, 2, :], sums[:, 3, :])
    dT1 = jnp.concatenate(
        [jnp.zeros_like(temps[:, :1]), dT_swept], axis=1)
    temps1 = temps - dT1
    t1_out[:, :] = temps1

    # ---- absorb sweep (`twostream.py:424-550`) at temps1 on the
    # fluxes the emit sweep just wrote (emit updates F_down rows
    # 1..L-1, so the downward seed row L-1 comes from fd_out; absorb
    # leaves that row as emit produced it) ----
    d = fd_out[:, L - 1, :]
    B2 = _planck(c1, xrow, temps1[:, L - 1][:, None])
    sd = None
    for i in range(L - 2, -1, -1):
        oh_T, oh_c = weights(temps1[:, i][:, None])
        kk = kappa_row(oh_T, oh_c, i)
        dtau = kk * dtfa_ref[0, i]
        om = sig / (sig + kk)
        B1 = _planck(c1, xrow, temps1[:, i][:, None])
        cp = two_stream_couplers_g0(dtau, om, B1, B2,
                                    expm1=expm1_series)
        F1u = fu_out[:, i, :]                 # stale: emit's output
        d_next = d
        d = cp.a * d_next + (-cp.b * F1u + cp.s_down)
        F2u = cp.a * F1u - cp.b * d_next + cp.s_up
        fd_out[:, i, :] = jnp.where(done, fd_ref[:, i, :], d)
        fu_out[:, i + 1, :] = jnp.where(done, fu_ref[:, i + 1, :], F2u)
        s_dn = jnp.sum(d_next * tw, axis=1) if sd is None else sd
        sd = jnp.sum(d * tw, axis=1)
        sums[:, 0, i] = jnp.sum(F2u * tw, axis=1)
        sums[:, 1, i] = s_dn
        sums[:, 2, i] = jnp.sum(F1u * tw, axis=1)
        sums[:, 3, i] = sd
        B2 = B1

    T1a = temps1[:, :-1]
    T2a = temps1[:, 1:]
    dT_swept = epilogue(T1a, T2a, p1a_ref[0, :][None, :],
                        p2a_ref[0, :][None, :],
                        sums[:, 0, :], sums[:, 1, :],
                        sums[:, 2, :], sums[:, 3, :])
    dT2 = jnp.concatenate(
        [dT_swept, jnp.zeros_like(temps[:, :1])], axis=1)
    t2_out[:, :] = temps1 - dT2
    dt2_out[:, :] = dT2


def _loop_kernel(scal_ref, temps_ref, fu_ref, fd_ref,
                 ktg_ref, ktab_ref, ctg_ref, ctab_ref,
                 lam_ref, sig_ref, ftoa_ref, tw_ref,
                 dtfe_ref, dtfa_ref, p1e_ref, p2e_ref, p1a_ref, p2a_ref,
                 fu_out, fd_out, tfin_out, hist_out, maxdt_out,
                 niter_out, conv_out,
                 sums, prevT_s, prevS_s, flips_s, ncols_s, done_s,
                 *, L, S, nT, n_timesteps, n_zero_crossings):
    """The WHOLE radiative-convective loop for one column block, in
    VMEM: ``n_timesteps`` x (emit + dT + absorb + dT) with the
    convergence statistics (incremental zero-crossing counters +
    |dT| threshold, `core.py:301-318`) held in VMEM scratch/output
    buffers — the iteration loop carries NO vector state (Mosaic
    rejects loop-carried vectors whose consumers need relayouts).

    This is the HBM end-game of the kernel series: the flux slabs are
    DMA'd in once and out once PER SOLVE — the two-kernel engine moves
    them per SWEEP (4 slab transfers x 2 sweeps x n_timesteps).

    Semantics match ``rt.solver.solve_rc_batched`` exactly: per-column
    freeze via masked writes, uniform history rows ``2 it`` /
    ``2 it + 1``, per-column iteration counters.  There is NO early
    exit: the loop is a fixed-trip ``fori_loop`` over ``n_timesteps``
    and a fully-converged block keeps iterating as masked no-ops
    (results are identical to the two-kernel engine's global early
    exit because frozen columns never change; the wasted trips only
    matter when every column of a block converges far before the
    horizon).
    """
    lam = lam_ref[0, :][None, :]
    c1 = 2.0 * const.h * const.c ** 2 / lam ** 5
    xrow = const.hc_over_k / lam
    sig = sig_ref[0, :][None, :]
    tw = tw_ref[0, :][None, :]
    dtype = fu_ref.dtype
    bc = fu_ref.shape[0]
    params = PhysicsParams(g=scal_ref[0, 0], m_bar=scal_ref[0, 1],
                           alpha=scal_ref[0, 2], n_dof=scal_ref[0, 3])
    cdT = scal_ref[0, 4]

    def epilogue(T1, T2, p1, p2, bu2, bd2, bu1, bd1):
        div, dz = physics.div_bol_net_flux(bu2, bd2, bu1, bd1,
                                           T1, T2, p1, p2, params)
        dt = physics.radiative_timestep(T1, T2, p1, p2, div, dz, params)
        return physics.delta_temperature(div, dt, T1, p1, p2, params)

    # state buffers start as the inputs; all later flux reads/writes
    # are in-place on the output slabs (the sweep orderings only ever
    # read rows not yet written within the same sweep)
    fu_out[:] = fu_ref[:]
    fd_out[:] = fd_ref[:]
    tfin_out[:, :] = temps_ref[:, :]
    n_hist = hist_out.shape[1]
    hist_out[:] = jnp.zeros((bc, n_hist, L), dtype)
    maxdt_out[:, :] = jnp.zeros((bc, n_timesteps), dtype)
    niter_out[:, :] = jnp.zeros((bc, L), dtype)
    conv_out[:, :] = jnp.zeros((bc, L), dtype)
    prevT_s[:, :] = temps_ref[:, :]
    prevS_s[:, :] = jnp.zeros((bc, L), dtype)
    flips_s[:, :] = jnp.zeros((bc, L), dtype)
    ncols_s[:, :] = jnp.zeros((bc, L), dtype)
    done_s[:, :] = jnp.zeros((bc, L), dtype)
    # history / max|dT| are updated by iota-masked full-buffer writes:
    # Mosaic cannot prove dynamic-index vector stores aligned
    hist_rows = jax.lax.broadcasted_iota(jnp.int32, (bc, n_hist, L), 1)
    maxdt_cols = jax.lax.broadcasted_iota(
        jnp.int32, (bc, n_timesteps), 1)

    ktg_row = ktg_ref[0, :]
    ctg_row = ctg_ref[0, :]

    def sweep_kappa(temps):
        """kappa rows for ALL layers of a sweep in one shot: the
        weight construction vectorizes over (bc, L) and the table
        contraction runs as one layer-batched MXU dispatch — the
        per-layer scalar-ish weight builds were the whole-iteration
        kernel's measured bottleneck (see docs/design-notes.md)."""
        Tc = temps[:, :, None]                        # (bc, L, 1)
        oh_T = _interp_weights_nd(ktg_row, Tc, clip=False)
        logT = jnp.log(Tc) * (1.0 / _LN10)
        oh_c = _interp_weights_nd(ctg_row, logT, clip=True)
        oh_T_l = jnp.moveaxis(oh_T, 0, 1)             # (L, bc, nT)
        kk = None
        for s_i in range(S):
            ln_mmr = jnp.sum(oh_c * ctab_ref[:, s_i, :][None, :, :],
                             axis=2)                  # (bc, L)
            mmr_l = jnp.moveaxis(jnp.exp(ln_mmr), 0, 1)[:, :, None]
            part = jax.lax.dot_general(
                oh_T_l, ktab_ref[:, s_i],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=ktab_ref.dtype,
                precision=jax.lax.Precision.HIGHEST)  # (L, bc, W)
            kk = part * mmr_l if kk is None else kk + part * mmr_l
        return kk                                     # (L, bc, W)

    def iteration(temps, done):
        """One emit + absorb pair in-place on fu_out / fd_out;
        returns (T1, T2, dT2).  ``done`` is the (bc, 1) freeze mask —
        frozen columns' rows are rewritten with their current value."""
        kk_all = sweep_kappa(temps)
        z = fu_out[:, 1, :]
        B1 = _planck(c1, xrow, temps[:, 1][:, None])
        sz = None
        for i in range(L - 1):
            l = i + 1
            kk = kk_all[l] + sig
            dtau = kk * dtfe_ref[0, i]
            om = sig / (sig + kk)
            if i < L - 2:
                B2 = _planck(c1, xrow, temps[:, l + 1][:, None])
                F2d = fd_out[:, l + 1, :]
            else:
                B2 = B1
                F2d = jnp.broadcast_to(ftoa_ref[0, :][None, :], z.shape)
            cp = two_stream_couplers_g0(dtau, om, B1, B2,
                                        expm1=expm1_series)
            u = z
            z = cp.a * u + (-cp.b * F2d + cp.s_up)
            F1d = cp.a * F2d - cp.b * u + cp.s_down
            if i < L - 2:
                fu_out[:, l + 1, :] = jnp.where(
                    done, fu_out[:, l + 1, :], z)
            fd_out[:, l, :] = jnp.where(done, fd_out[:, l, :], F1d)
            su = jnp.sum(u * tw, axis=1) if sz is None else sz
            sz = jnp.sum(z * tw, axis=1)
            sums[:, 0, i] = sz
            sums[:, 1, i] = jnp.sum(F2d * tw, axis=1)
            sums[:, 2, i] = su
            sums[:, 3, i] = jnp.sum(F1d * tw, axis=1)
            B1 = B2

        T1e = temps[:, 1:]
        T2e = jnp.concatenate([temps[:, 2:], temps[:, -1:]], axis=1)
        dT_swept = epilogue(T1e, T2e, p1e_ref[0, :][None, :],
                            p2e_ref[0, :][None, :],
                            sums[:, 0, :], sums[:, 1, :],
                            sums[:, 2, :], sums[:, 3, :])
        dT1 = jnp.concatenate(
            [jnp.zeros_like(temps[:, :1]), dT_swept], axis=1)
        temps1 = jnp.where(done, temps, temps - dT1)

        kk_all = sweep_kappa(temps1)
        d = fd_out[:, L - 1, :]
        B2 = _planck(c1, xrow, temps1[:, L - 1][:, None])
        sd = None
        for i in range(L - 2, -1, -1):
            kk = kk_all[i] + sig
            dtau = kk * dtfa_ref[0, i]
            om = sig / (sig + kk)
            B1 = _planck(c1, xrow, temps1[:, i][:, None])
            cp = two_stream_couplers_g0(dtau, om, B1, B2,
                                        expm1=expm1_series)
            F1u = fu_out[:, i, :]
            d_next = d
            d = cp.a * d_next + (-cp.b * F1u + cp.s_down)
            F2u = cp.a * F1u - cp.b * d_next + cp.s_up
            fd_out[:, i, :] = jnp.where(done, fd_out[:, i, :], d)
            fu_out[:, i + 1, :] = jnp.where(
                done, fu_out[:, i + 1, :], F2u)
            s_dn = jnp.sum(d_next * tw, axis=1) if sd is None else sd
            sd = jnp.sum(d * tw, axis=1)
            sums[:, 0, i] = jnp.sum(F2u * tw, axis=1)
            sums[:, 1, i] = s_dn
            sums[:, 2, i] = jnp.sum(F1u * tw, axis=1)
            sums[:, 3, i] = sd
            B2 = B1

        T1a = temps1[:, :-1]
        T2a = temps1[:, 1:]
        dT_swept = epilogue(T1a, T2a, p1a_ref[0, :][None, :],
                            p2a_ref[0, :][None, :],
                            sums[:, 0, :], sums[:, 1, :],
                            sums[:, 2, :], sums[:, 3, :])
        dT2 = jnp.concatenate(
            [dT_swept, jnp.zeros_like(temps[:, :1])], axis=1)
        return temps1, jnp.where(done, temps, temps1 - dT2), dT2

    def push(T_new, prev_T, prev_sign, flips, n_cols):
        """Incremental zero-crossing statistics (rt.solver
        ``_push_history``), all float32 in-kernel."""
        s = jnp.sign(T_new - prev_T)
        can_flip = n_cols >= 2.0
        has_diff = n_cols >= 1.0
        flips = flips + jnp.where(
            can_flip & (s != prev_sign), 1.0, 0.0)
        prev_sign = jnp.where(has_diff, s, prev_sign)
        return T_new, prev_sign, flips, n_cols + 1.0

    def body(it, _):
        temps = tfin_out[:, :]
        done = done_s[:, :]
        done_col = done[:, :1]
        T1, T2, dT2 = iteration(temps, done_col)

        live = done_col < 1.0                                # (bc, 1)
        hist_out[:] = jnp.where(
            (hist_rows == 2 * it) & live[:, :, None],
            T1[:, None, :], hist_out[:])
        prev_T1, prev_sign1, flips1, n_cols1 = push(
            T1, prevT_s[:, :], prevS_s[:, :], flips_s[:, :],
            ncols_s[:, :])
        hist_out[:] = jnp.where(
            (hist_rows == 2 * it + 1) & live[:, :, None],
            T2[:, None, :], hist_out[:])
        prev_T2, prev_sign2, flips2, n_cols2 = push(
            T2, prev_T1, prev_sign1, flips1, n_cols1)

        conv_layers = ((flips2 > n_zero_crossings)
                       | (jnp.abs(dT2) < cdT))
        new_done = jnp.min(
            conv_layers.astype(dtype), axis=1, keepdims=True) > 0.0
        maxdt_out[:, :] = jnp.where(
            (maxdt_cols == it) & live,
            jnp.max(jnp.abs(dT2), axis=1, keepdims=True),
            maxdt_out[:, :])

        def sel(new, old):
            return jnp.where(done_col, old, new)
        tfin_out[:, :] = sel(T2, temps)
        prevT_s[:, :] = sel(prev_T2, prevT_s[:, :])
        prevS_s[:, :] = sel(prev_sign2, prevS_s[:, :])
        flips_s[:, :] = sel(flips2, flips_s[:, :])
        ncols_s[:, :] = sel(n_cols2, ncols_s[:, :])
        conv_out[:, :] = sel(conv_layers.astype(dtype), conv_out[:, :])
        done_s[:, :] = jnp.maximum(
            done, jnp.broadcast_to(new_done.astype(dtype), (bc, L)))
        niter_out[:, :] = sel(
            jnp.full((bc, L), 0.0, dtype) + (it + 1), niter_out[:, :])
        return 0

    # fixed-trip fori: converged columns freeze via the masked
    # writes, so extra trips are no-ops (the two-kernel engine's
    # global early exit yields identical results)
    jax.lax.fori_loop(0, n_timesteps, body, 0)


def rc_loop_pallas(temps, F_up, F_down, pack: IterationPack,
                   params: PhysicsParams, n_timesteps: int,
                   n_zero_crossings: int, convergence_dT: float,
                   block_columns: int = 8, interpret: bool = False):
    """Run the full fixed-horizon RC loop in one kernel pass.

    Returns ``(loop_temps, F_up, F_down, hist, max_dT, n_iters,
    converged)`` with the exact ``solve_rc_batched`` loop semantics
    (the final output emit still runs as a separate sweep kernel).
    """
    B, L, W = F_up.shape
    S = pack.k_tab.shape[1]
    nT = pack.k_tgrid.shape[1]
    dtype = F_up.dtype
    bc = min(block_columns, B)
    pad = (-B) % bc
    if pad:
        temps = jnp.concatenate([temps, temps[-1:].repeat(pad, 0)])
        F_up = jnp.concatenate([F_up, F_up[-1:].repeat(pad, 0)])
        F_down = jnp.concatenate([F_down, F_down[-1:].repeat(pad, 0)])
    Bp = B + pad
    n_hist = 2 * n_timesteps

    scal = jnp.stack([jnp.asarray(params.g, dtype),
                      jnp.asarray(params.m_bar, dtype),
                      jnp.asarray(params.alpha, dtype),
                      jnp.asarray(params.n_dof, dtype),
                      jnp.asarray(convergence_dT, dtype)])[None, :]

    def vec(width):
        return pl.BlockSpec((1, width), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def rows(width):
        return pl.BlockSpec((bc, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    slab = partial(pl.BlockSpec, (bc, L, W), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM)
    sc = pack.sc
    out = pl.pallas_call(
        partial(_loop_kernel, L=L, S=S, nT=nT,
                n_timesteps=n_timesteps,
                n_zero_crossings=float(n_zero_crossings)),
        grid=(Bp // bc,),
        in_specs=[
            pl.BlockSpec((1, 5), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            rows(L),
            slab(), slab(),
            vec(nT),
            pl.BlockSpec(pack.k_tab.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(pack.c_tgrid.shape[1]),
            pl.BlockSpec(pack.c_tab.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(W), vec(W), vec(W), vec(W),
            pl.BlockSpec((1, L - 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L - 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            vec(L - 1), vec(L - 1), vec(L - 1), vec(L - 1),
        ],
        out_specs=[
            slab(), slab(), rows(L),
            pl.BlockSpec((bc, n_hist, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            rows(n_timesteps), rows(L), rows(L),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, L, W), dtype),
            jax.ShapeDtypeStruct((Bp, L, W), dtype),
            jax.ShapeDtypeStruct((Bp, L), dtype),
            jax.ShapeDtypeStruct((Bp, n_hist, L), dtype),
            jax.ShapeDtypeStruct((Bp, n_timesteps), dtype),
            jax.ShapeDtypeStruct((Bp, L), dtype),
            jax.ShapeDtypeStruct((Bp, L), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bc, 4, L - 1), dtype)]
        + [pltpu.VMEM((bc, L), dtype) for _ in range(5)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(scal, temps, F_up, F_down,
      pack.k_tgrid, pack.k_tab, pack.c_tgrid, pack.c_tab,
      sc.lam, sc.sigma, sc.f_toa, sc.tw,
      sc.dtf_emit, sc.dtf_absorb,
      pack.p1e, pack.p2e, pack.p1a, pack.p2a)
    Fu, Fd, tfin, hist, maxdt, niter, conv = out
    if pad:
        Fu, Fd, tfin = Fu[:B], Fd[:B], tfin[:B]
        hist, maxdt = hist[:B], maxdt[:B]
        niter, conv = niter[:B], conv[:B]
    return (tfin, Fu, Fd, hist, maxdt,
            niter[:, 0].astype(jnp.int32), conv > 0.5)


def rc_iteration_pallas(temps, F_up, F_down, done, pack: IterationPack,
                        params: PhysicsParams,
                        block_columns: int = 8,
                        interpret: bool = False):
    """One full RC iteration (emit + absorb + temperature updates).

    Returns (T1, F_up_new, F_down_new, T2, dT2): the emit-updated
    temperatures (for the history), the flux state after both sweeps,
    the absorb-updated temperatures, and the absorb temperature
    change (for the convergence statistics).  Flux-state rows of
    columns flagged ``done`` are passed through unchanged (the
    convergence freeze, applied in-kernel to avoid a separate
    (columns, layers, bins) select pass).
    """
    B, L, W = F_up.shape
    S = pack.k_tab.shape[1]
    nT = pack.k_tgrid.shape[1]
    dtype = F_up.dtype
    bc = min(block_columns, B)
    pad = (-B) % bc
    if pad:
        temps = jnp.concatenate([temps, temps[-1:].repeat(pad, 0)])
        F_up = jnp.concatenate([F_up, F_up[-1:].repeat(pad, 0)])
        F_down = jnp.concatenate([F_down, F_down[-1:].repeat(pad, 0)])
        done = jnp.concatenate([done, done[-1:].repeat(pad, 0)])
    Bp = B + pad

    scal = jnp.stack([jnp.asarray(params.g, dtype),
                      jnp.asarray(params.m_bar, dtype),
                      jnp.asarray(params.alpha, dtype),
                      jnp.asarray(params.n_dof, dtype)])[None, :]
    done_col = done.astype(dtype)[:, None]

    def vec(width):
        return pl.BlockSpec((1, width), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def rows(width):
        return pl.BlockSpec((bc, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    slab = partial(pl.BlockSpec, (bc, L, W), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM)
    sc = pack.sc
    out = pl.pallas_call(
        partial(_kernel, L=L, S=S, nT=nT),
        grid=(Bp // bc,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            rows(1), rows(L),
            slab(), slab(),
            vec(nT),
            pl.BlockSpec(pack.k_tab.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(pack.c_tgrid.shape[1]),
            pl.BlockSpec(pack.c_tab.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(W), vec(W), vec(W), vec(W),
            pl.BlockSpec((1, L - 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L - 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            vec(L - 1), vec(L - 1), vec(L - 1), vec(L - 1),
        ],
        out_specs=[
            slab(), slab(), rows(L), rows(L), rows(L),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, L, W), dtype),
            jax.ShapeDtypeStruct((Bp, L, W), dtype),
            jax.ShapeDtypeStruct((Bp, L), dtype),
            jax.ShapeDtypeStruct((Bp, L), dtype),
            jax.ShapeDtypeStruct((Bp, L), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bc, 4, L - 1), dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(scal, done_col, temps, F_up, F_down,
      pack.k_tgrid, pack.k_tab, pack.c_tgrid, pack.c_tab,
      sc.lam, sc.sigma, sc.f_toa, sc.tw,
      sc.dtf_emit, sc.dtf_absorb,
      pack.p1e, pack.p2e, pack.p1a, pack.p2a)
    Fu, Fd, T1, T2, dT2 = out
    if pad:
        Fu, Fd = Fu[:B], Fd[:B]
        T1, T2, dT2 = T1[:B], T2[:B], dT2[:B]
    return T1, Fu, Fd, T2, dT2
