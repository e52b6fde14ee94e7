"""Fused batched emit/absorb sweep kernels (Pallas TPU).

The XLA sweep path (``frei_tpu.rt.sweeps``) materializes every
intermediate of a sweep in HBM: the per-layer Planck radiances, the
two-stream couplers, the scan levels, and the flux updates — ~10
(columns, layers, bins) round trips per sweep on top of the 3 the
physics actually requires (read kappa, read + write the flux state).
These kernels fuse one whole sweep into a single VMEM-resident pass:

  per (column-block) grid instance, with the full (L, W) slab of the
  block's columns in VMEM:
    loop over layers (static unroll, the reference's sequential
    Gauss-Seidel ordering, `/root/reference/frei/twostream.py:356,491`):
      Planck radiance from precomputed spectral constants (1 expm1
      per layer instead of 2 — the B2 row is the next step's B1),
      two-stream couplers (the SAME ``two_stream_couplers`` function
      as the XLA path — single source of truth for the physics),
      the affine flux recurrence carried in registers,
      the four bolometric quadratures reduced in-VMEM.

HBM traffic per sweep drops to: read kappa + F_up + F_down, write
F_up + F_down (+ the tiny (columns, 4, layers) quadrature block) —
the speed-of-light minimum for this sweep formulation.

The temperature-tendency epilogue (flux-divergence -> adaptive
timestep -> dT, `twostream.py:396-405`) runs as ordinary XLA on the
kernel's (columns, layers) quadrature outputs, reusing
``frei_tpu.rt.physics`` verbatim — it is O(columns x layers), a
thousandth of the sweep's data.

Layout contract: ``columns`` is the leading (grid-blocked) axis; the
(L, W) slab of each column block lives in VMEM, so W tiles the lane
dimension and L the sublanes.  W need not be a multiple of 128 —
Mosaic masks the padded lanes (reductions included).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as const
from ..rt import physics
from ..rt.physics import PhysicsParams
from .twostream import expm1_series, two_stream_couplers_g0

__all__ = ["SweepConsts", "make_sweep_consts", "emit_sweep_pallas",
           "absorb_sweep_pallas", "set_kappa_dot_mode",
           "set_ohs_layout", "set_planck_mode"]

#: In-kernel kappa-contraction lowering variant.  "batched" (default)
#: is the production path: one layer-batched f32 dot at HIGHEST
#: precision.  The alternatives exist for the measured lowering
#: experiment matrix in docs/design-notes.md (whether Mosaic can
#: engage the MXU for this small-K contraction): "perlayer" = L
#: un-batched (bc, K) @ (K, W) dots; "padk" = K zero-padded to a
#: multiple of 128 (numerically exact); "bf16" = single-pass bf16
#: inputs with f32 accumulation (NOT parity-safe — perf ceiling
#: datapoint only); "bf16x2" = two-term Dekker split of both operands
#: into bf16 hi/lo with three single-pass dots (f32-grade accuracy,
#: drops only the lo*lo term); "padk32" = K zero-padded to a multiple
#: of 32 only (sublane-aligning the table's contraction axis without
#: padk's 4.3x FMA cost — exact); "tabT" = pre-transposed (L, W, K)
#: table with the contraction over the minor axis of both operands
#: (round-5 staging experiment: does Mosaic's operand staging prefer
#: a lane-aligned contraction axis?).
_KAPPA_DOT_MODE = os.environ.get("FREI_KAPPA_DOT", "batched")

_KAPPA_DOT_MODES = ("batched", "perlayer", "padk", "bf16", "bf16x2",
                    "padk32", "tabT")

#: Layout in which the solver hands the T-interp weight slab to
#: `_run_sweep`.  "batch" (default): (B, L, K), transposed here to the
#: kernel's layer-major (L, B, K) with a jnp.moveaxis.  "layer": built
#: layer-major upstream (tables.layer_interp_weights layer_major=True)
#: so the XLA graph never materializes-then-transposes the slab —
#: round-5 staging experiment (docs/design-notes.md).  NUMERICALLY
#: EXACT either way (same weights, same contraction); trace-time
#: module global with the same caveats as _KAPPA_DOT_MODE.
_OHS_LAYOUT = os.environ.get("FREI_OHS_LAYOUT", "batch")
_OHS_LAYOUTS = ("batch", "layer")


def set_ohs_layout(layout: str) -> None:
    """Select the weight-slab handoff layout (see ``_OHS_LAYOUT``).
    Exact lowering variant; takes effect at the next trace — clear jit
    caches between layouts.  "layer" warns: it is a committed negative
    result (measured 61% SLOWER, docs/design-notes.md round 5)."""
    global _OHS_LAYOUT
    if layout not in _OHS_LAYOUTS:
        raise ValueError(f"unknown ohs layout {layout!r} "
                         f"(expected one of {_OHS_LAYOUTS})")
    if layout != "batch":
        _warn_nonbatched(layout, "set_ohs_layout")
    _OHS_LAYOUT = layout


if _OHS_LAYOUT not in _OHS_LAYOUTS:
    raise ValueError(
        f"FREI_OHS_LAYOUT={_OHS_LAYOUT!r}: unknown ohs layout "
        f"(expected one of {_OHS_LAYOUTS})")


def _warn_nonbatched(mode: str, source: str) -> None:
    # Non-default lowerings are experiment-matrix datapoints and not
    # parity-grade (kappa 'bf16' has ~0.7% error; planck 'table' has
    # the table's interpolation error).  The mode is a trace-time
    # module global (not part of the jit cache key), so a stray
    # setting would otherwise degrade production numerics with no
    # trail — be loud.
    import warnings
    warnings.warn(
        f"{source} selects non-default kernel lowering {mode!r} "
        "(experiment-only; NOT the parity path). Takes effect at the "
        "NEXT trace only — already-compiled solves keep their "
        "lowering.", stacklevel=3)


if _KAPPA_DOT_MODE not in _KAPPA_DOT_MODES:
    raise ValueError(
        f"FREI_KAPPA_DOT={_KAPPA_DOT_MODE!r}: unknown kappa dot mode "
        f"(expected one of {_KAPPA_DOT_MODES})")
if _KAPPA_DOT_MODE != "batched":
    _warn_nonbatched(_KAPPA_DOT_MODE, "env FREI_KAPPA_DOT")
if _OHS_LAYOUT != "batch":
    _warn_nonbatched(_OHS_LAYOUT, "env FREI_OHS_LAYOUT")


def set_kappa_dot_mode(mode: str) -> None:
    """Select the in-kernel kappa-contraction lowering (see
    ``_KAPPA_DOT_MODE``).  Takes effect at the next trace; callers
    must clear jit caches (or use fresh configs) between modes.
    Non-'batched' modes warn: they exist for the lowering experiment
    matrix (tools/kappa_matrix.py), not production."""
    global _KAPPA_DOT_MODE
    if mode not in _KAPPA_DOT_MODES:
        raise ValueError(f"unknown kappa dot mode {mode!r}")
    if mode != "batched":
        _warn_nonbatched(mode, "set_kappa_dot_mode")
    _KAPPA_DOT_MODE = mode


#: In-kernel Planck-radiance evaluation.  "direct" (production): one
#: expm1_series + divide per (bc, W) layer row.  "table": B(T, lam)
#: precomputed on a log-T grid (make_sweep_consts) and evaluated
#: in-kernel as a gather-free one-hot T-contraction — the round-4
#: bounded experiment asking whether the transcendental block can ride
#: the matrix unit the way kappa's contraction was measured NOT to
#: (docs/design-notes.md kappa lowering matrix).  Linear-in-logT
#: interpolation error is ~2.8e-5 of the per-T spectral peak at
#: n=1024 and scales as 1/n^2 (measured; ~4.4e-7 at n=8192), so
#: "table" at the default size is an experiment-grade approximation,
#: NOT the parity path.
_PLANCK_MODE = "direct"
_PLANCK_TABLE_N = 1024
#: log-T table span [K]; clamped (flat) outside.
_PLANCK_T_RANGE = (400.0, 6500.0)


def set_planck_mode(mode: str, n_table: int = 1024) -> None:
    """Select the in-kernel Planck evaluation ("direct" | "table").
    Trace-time module global like :func:`set_kappa_dot_mode` — same
    caveats, same experiment-only status for the non-default mode."""
    global _PLANCK_MODE, _PLANCK_TABLE_N
    if mode not in ("direct", "table"):
        raise ValueError(f"unknown planck mode {mode!r}")
    if mode == "table" and int(n_table) < 2:
        # validated here, where the misconfiguration happens: n=1
        # would divide by (n - 1) == 0 deep inside the jit trace
        raise ValueError(f"planck table needs n_table >= 2, "
                         f"got {n_table}")
    if mode != "direct":
        _warn_nonbatched(mode, "set_planck_mode")
    _PLANCK_MODE = mode
    _PLANCK_TABLE_N = int(n_table)


def _planck_table(lam_row, n, dtype):
    """(n, W) Planck radiances on the static log-T grid, plus the
    (lt0, inv_dlt) index transform (position = (ln T - lt0) * inv_dlt).
    Built ONCE per solve in make_sweep_consts — never inside the
    iteration loop.

    The build runs inside the solver's jit trace (lam is a tracer), so
    it evaluates through :func:`ops.planck.planck_lambda` at the
    widest enabled float: float64 under ``jax_enable_x64``, else
    float32 — in which case the table carries ~1-ulp (1e-7) build
    quantization on top of the interpolation error (only visible at
    n >~ 8192, where interpolation alone reaches ~4e-7 of peak)."""
    import numpy as np

    from .planck import planck_lambda
    t0, t1 = _PLANCK_T_RANGE
    lt0 = float(np.log(t0))
    dlt = (float(np.log(t1)) - lt0) / (n - 1)
    wide = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    tgrid = jnp.exp(lt0 + dlt * jnp.arange(n, dtype=wide))
    lam = lam_row.reshape(-1).astype(wide)
    tab = planck_lambda(tgrid[:, None], lam[None, :])
    return tab.astype(dtype), (lt0, 1.0 / dlt)


class SweepConsts(NamedTuple):
    """Device-resident per-configuration constants for the fused
    sweep kernels (all rows shaped (1, N) for TPU layout).

    Per-planet population solves (reference `core.py:48-62`: F_TOA is
    the only per-planet spectral input; gravity enters through the
    optical-depth factor and the timestep physics) use the per-column
    forms: ``f_toa`` (B, W) and ``inv_g`` (B, 1).  With per-column
    gravity the dtf rows hold the bare pressure differences and the
    kernels apply ``1/g`` as a (bc, 1) broadcast multiply — a
    per-column (B, L-1) dtf matrix would need a lane extraction per
    layer inside the kernel (a Mosaic relayout, measured slow)."""

    dtf_emit: jnp.ndarray    # (1, L-1) (p1 - p2) [/ g] per swept layer
    dtf_absorb: jnp.ndarray  # (1, L-1) same for absorb ordering
    lam: jnp.ndarray         # (1, W) wavelengths [cm]
    sigma: jnp.ndarray       # (1, W) Rayleigh scattering opacity
    f_toa: jnp.ndarray       # (1, W) or (B, W) top-of-atmosphere flux
    tw: jnp.ndarray          # (1, W) trapezoid quadrature weights
    inv_g: jnp.ndarray = None  # (B, 1) per-column 1/g, or None (shared
    #                            g folded into the dtf rows)
    planck_tab: jnp.ndarray = None  # (nT, W) log-T Planck table, only
    #                            under the experimental "table" mode
    planck_idx: tuple = None   # static (lt0, inv_dlt) index transform


def make_sweep_consts(consts, params: PhysicsParams) -> SweepConsts:
    """Precompute kernel constants from solver ``RTConstants``.

    ``params.g`` may be a scalar (shared gravity, folded into the dtf
    rows exactly like the reference's ``delta_tau``) or a (B,)/(B, 1)
    per-column array (population mode: dtf rows stay bare pressure
    differences and ``inv_g`` carries 1/g).  ``consts.F_toa`` may be
    (W,) shared or (B, W) per-column.
    """
    p = consts.pressures
    lam = consts.lam_cm
    dtype = lam.dtype
    # emit sweeps layers l = 1 .. L-1: p1 = p[l], p2 = p[l+1] with the
    # top-layer extrapolation p2 = p[-1] p[-2] / p[-3]
    # (`twostream.py:358-359`).
    p1e = p[1:]
    p2e = jnp.concatenate([p[2:], (p[-1] * p[-2] / p[-3])[None]])
    # absorb sweeps layers i = 0 .. L-2: p1 = p[i], p2 = p[i+1].
    p1a = p[:-1]
    p2a = p[1:]
    g = jnp.asarray(params.g, dtype)
    if g.ndim == 0:
        dtf_e = ((p1e - p2e) / g)[None, :]
        dtf_a = ((p1a - p2a) / g)[None, :]
        inv_g = None
    else:
        dtf_e = (p1e - p2e)[None, :]
        dtf_a = (p1a - p2a)[None, :]
        inv_g = (1.0 / g.reshape(-1, 1)).astype(dtype)
    f_toa = consts.F_toa
    if f_toa.ndim == 1:
        f_toa = f_toa[None, :]
    planck_tab, planck_idx = (None, None)
    if _PLANCK_MODE == "table":
        planck_tab, planck_idx = _planck_table(lam, _PLANCK_TABLE_N,
                                               dtype)
    return SweepConsts(
        dtf_emit=dtf_e,
        dtf_absorb=dtf_a,
        lam=lam[None, :],
        sigma=consts.sigma_scat[None, :],
        f_toa=f_toa,
        tw=consts.trapz_w[None, :],
        inv_g=inv_g,
        planck_tab=planck_tab,
        planck_idx=planck_idx,
    )


def _planck_row(c1, xrow, T_col):
    """B_lambda for one layer of a column block: (bc, 1) temperatures
    against the hoisted (1, W) row ``xrow = hc/(k lam)`` — the
    full-width per-layer divide of ``hc/(k lam T)`` becomes one (bc, 1)
    reciprocal plus a multiply (equal to ``ops.planck.planck_lambda``
    to float rounding; engines are cross-checked on converged
    outputs)."""
    return c1 / expm1_series(xrow * (1.0 / T_col))


def _unpack(refs, fused, col_g, planck=None):
    """Kernel ref unpacking for the two kappa modes: ``fused`` swaps
    the (bc, L, W) opacity slab input for the (bc, L, K) T-interp
    weight rows + the VMEM-resident (L, K, W) layer tables — the
    kappa slab then never exists in HBM at all.  ``done_ref`` carries
    the per-column convergence freeze (> 0 = write old rows back),
    applied in-kernel so the solver never runs a separate
    (columns, layers, bins) select pass.  ``col_g`` inserts the
    per-column (bc, 1) 1/g block after ``done_ref`` and turns the
    per-layer dtau factor into a (bc, 1) broadcast.  ``planck`` =
    static (lt0, inv_dlt) selects the experimental table-contraction
    Planck evaluation (an extra (nT, W) VMEM table ref follows the
    kappa refs); None = direct expm1 evaluation (production)."""
    refs = list(refs)
    dtf_ref, done_ref = refs[0], refs[1]
    rest = refs[2:]
    if col_g:
        invg = rest[0][:, :]                          # (bc, 1)
        rest = rest[1:]

        def dt_fac(i):
            return dtf_ref[0, i] * invg               # (bc, 1)
    else:
        def dt_fac(i):
            return dtf_ref[0, i]                      # scalar
    if fused:
        (temps_ref, ohs_ref, tab_ref, *rest) = rest
    else:
        (temps_ref, k_ref, *rest) = rest
    ptab_ref = None
    if planck is not None:
        ptab_ref, rest = rest[0], rest[1:]
    (fu_ref, fd_ref, lam_ref, sig_ref, ftoa_ref, tw_ref,
     fu_out, fd_out, sums_ref) = rest
    sig = sig_ref[0, :][None, :]
    done = done_ref[:, :] > 0.0                       # (bc, 1)

    lam = lam_ref[0, :][None, :]
    if planck is None:
        c1 = 2.0 * const.h * const.c ** 2 / lam ** 5
        xrow = const.hc_over_k / lam      # hoisted Planck argument

        def planck_row(T_col):
            return _planck_row(c1, xrow, T_col)
    else:
        lt0, inv_dlt = planck
        nTp = ptab_ref.shape[0]

        def planck_row(T_col):
            # one-hot linear interpolation on the static log-T grid:
            # 2 nonzero weights per row, evaluated as a dense
            # (bc, nT) x (nT, W) contraction (the experiment's point)
            t = jnp.clip((jnp.log(T_col) - lt0) * inv_dlt,
                         0.0, nTp - 1.0)
            i0 = jnp.minimum(jnp.floor(t), nTp - 2.0)
            f = t - i0
            i0i = i0.astype(jnp.int32)                # (bc, 1)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (T_col.shape[0], nTp), 1)
            w = (jnp.where(iota == i0i, 1.0 - f, 0.0)
                 + jnp.where(iota == i0i + 1, f, 0.0))
            return jax.lax.dot_general(
                w.astype(ptab_ref.dtype), ptab_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=ptab_ref.dtype,
                precision=jax.lax.Precision.HIGHEST)

    if fused:
        mode = _KAPPA_DOT_MODE
        # ohs arrives layer-major (L, bc, K): all layers' kappa rows
        # contract in ONE batched dispatch instead of L small
        # (bc, K) x (K, W) dots (Mosaic requires the batch dims in
        # matching positions, hence the layer-major layout); k_total
        # includes the scattering term (`opacity.py:265-268`)
        batched_dn = (((2,), (1,)), ((0,), (0,)))
        if mode in ("batched", "padk", "padk32"):
            # padk/padk32: K was zero-padded (to 128 / 32) in
            # _run_sweep — the contraction itself is identical (zeros
            # add nothing)
            kk_all = jax.lax.dot_general(
                ohs_ref[:], tab_ref[:],
                dimension_numbers=batched_dn,
                preferred_element_type=tab_ref.dtype,
                precision=jax.lax.Precision.HIGHEST)  # (L, bc, W)
        elif mode == "tabT":
            # pre-transposed table: contraction over the MINOR (lane)
            # axis of both operands — staging experiment
            kk_all = jax.lax.dot_general(
                ohs_ref[:], tab_ref[:],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=tab_ref.dtype,
                precision=jax.lax.Precision.HIGHEST)  # (L, bc, W)
        elif mode == "bf16":
            kk_all = jax.lax.dot_general(
                ohs_ref[:].astype(jnp.bfloat16),
                tab_ref[:].astype(jnp.bfloat16),
                dimension_numbers=batched_dn,
                preferred_element_type=jnp.float32)
        elif mode == "bf16x2":
            a = ohs_ref[:]
            b = tab_ref[:]
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(a.dtype)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(b.dtype)).astype(jnp.bfloat16)

            def d(x, y):
                return jax.lax.dot_general(
                    x, y, dimension_numbers=batched_dn,
                    preferred_element_type=jnp.float32)
            kk_all = d(ah, bh) + (d(ah, bl) + d(al, bh))
        elif mode == "perlayer":
            kk_all = None
        else:
            raise ValueError(f"unknown kappa dot mode {mode!r}")

        if kk_all is None:
            def k_row(l):
                kk = jax.lax.dot_general(
                    ohs_ref[l], tab_ref[l],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=tab_ref.dtype,
                    precision=jax.lax.Precision.HIGHEST)
                return kk + sig
        else:
            def k_row(l):
                return kk_all[l] + sig
    else:
        def k_row(l):
            return k_ref[:, l, :]
    return (dt_fac, done, temps_ref, k_row, fu_ref, fd_ref, planck_row,
            sig, ftoa_ref, tw_ref, fu_out, fd_out, sums_ref)


def _emit_kernel(*refs, L, fused, col_g=False, col_ftoa=False,
                 planck=None):
    """One bottom-to-top emission sweep for a block of columns
    (reference `twostream.py:290-421`, ordering per rt.sweeps).

    Per-layer loop: each step is a handful of (bc, W) vector ops plus
    one (bc, W) -> (bc,) quadrature reduction; measured faster than a
    fully slab-vectorized formulation (whose boundary concatenates
    copy whole (bc, L, W) slabs in VMEM)."""
    (dt_fac, done, temps_ref, k_row, fu_ref, fd_ref, planck_row, sig,
     ftoa_ref, tw_ref, fu_out, fd_out, sums_ref) = _unpack(
         refs, fused, col_g, planck)
    tw = tw_ref[0, :][None, :]

    # Untouched rows (`twostream.py:356,392-393`).
    fu_out[:, 0, :] = fu_ref[:, 0, :]
    fu_out[:, 1, :] = fu_ref[:, 1, :]
    fd_out[:, 0, :] = fd_ref[:, 0, :]

    z = fu_ref[:, 1, :]                       # F_1_up carry
    B1 = planck_row(temps_ref[:, 1][:, None])
    sz = None
    for i in range(L - 1):
        l = i + 1                             # swept layer
        kk = k_row(l)
        dtau = kk * dt_fac(i)
        om = sig / (sig + kk)
        if i < L - 2:
            B2 = planck_row(temps_ref[:, l + 1][:, None])
            F2d = fd_ref[:, l + 1, :]
        elif col_ftoa:
            B2 = B1                           # T2 = T[-1] at the top
            F2d = ftoa_ref[:, :]              # per-column F_TOA rows
        else:
            B2 = B1
            F2d = jnp.broadcast_to(ftoa_ref[0, :][None, :], z.shape)
        cp = two_stream_couplers_g0(dtau, om, B1, B2,
                                    expm1=expm1_series)
        u = z
        z = cp.a * u + (-cp.b * F2d + cp.s_up)
        F1d = cp.a * F2d - cp.b * u + cp.s_down
        if i < L - 2:
            fu_out[:, l + 1, :] = jnp.where(   # top z never stored
                done, fu_ref[:, l + 1, :], z)
        fd_out[:, l, :] = jnp.where(done, fd_ref[:, l, :], F1d)
        # this step's incoming-flux quadrature IS the previous step's
        # outgoing one (u == previous z) — reuse instead of re-reducing
        su = jnp.sum(u * tw, axis=1) if sz is None else sz
        sz = jnp.sum(z * tw, axis=1)
        sums_ref[:, 0, i] = sz
        sums_ref[:, 1, i] = jnp.sum(F2d * tw, axis=1)
        sums_ref[:, 2, i] = su
        sums_ref[:, 3, i] = jnp.sum(F1d * tw, axis=1)
        B1 = B2


def _absorb_kernel(*refs, L, fused, col_g=False, col_ftoa=False,
                   planck=None):
    """One top-to-bottom absorption sweep for a block of columns
    (reference `twostream.py:424-550`, ordering per rt.sweeps)."""
    del col_ftoa  # F_TOA enters absorb only via the F_down state
    (dt_fac, done, temps_ref, k_row, fu_ref, fd_ref, planck_row, sig,
     _ftoa_ref, tw_ref, fu_out, fd_out, sums_ref) = _unpack(
         refs, fused, col_g, planck)
    tw = tw_ref[0, :][None, :]

    fu_out[:, 0, :] = fu_ref[:, 0, :]
    fd_out[:, L - 1, :] = fd_ref[:, L - 1, :]

    d = fd_ref[:, L - 1, :]                   # F_2_down carry
    B2 = planck_row(temps_ref[:, L - 1][:, None])
    sd = None
    for i in range(L - 2, -1, -1):
        kk = k_row(i)
        dtau = kk * dt_fac(i)
        om = sig / (sig + kk)
        B1 = planck_row(temps_ref[:, i][:, None])
        cp = two_stream_couplers_g0(dtau, om, B1, B2,
                                    expm1=expm1_series)
        F1u = fu_ref[:, i, :]                 # stale upward flux
        d_next = d
        d = cp.a * d_next + (-cp.b * F1u + cp.s_down)
        F2u = cp.a * F1u - cp.b * d_next + cp.s_up
        fd_out[:, i, :] = jnp.where(done, fd_ref[:, i, :], d)
        fu_out[:, i + 1, :] = jnp.where(done, fu_ref[:, i + 1, :], F2u)
        # d_next == previous step's d: reuse its quadrature
        s_dn = jnp.sum(d_next * tw, axis=1) if sd is None else sd
        sd = jnp.sum(d * tw, axis=1)
        sums_ref[:, 0, i] = jnp.sum(F2u * tw, axis=1)
        sums_ref[:, 1, i] = s_dn
        sums_ref[:, 2, i] = jnp.sum(F1u * tw, axis=1)
        sums_ref[:, 3, i] = sd
        B2 = B1


def _run_sweep(kernel, dtf, temps, kappa, F_up, F_down, sc: SweepConsts,
               block_columns: int, interpret: bool, done=None):
    """``kappa`` is either the (B, L, W) total-opacity slab, or an
    ``(ohs, tab)`` pair — (B, L, K) T-interp weight rows + (L, K, W)
    layer tables (see ``opacity.tables.layer_interp_weights``) — in
    which case the opacity is contracted inside the kernel and never
    materialized in HBM.  ``done`` (B,) bool freezes those columns'
    flux rows in-kernel."""
    fused = isinstance(kappa, tuple)
    B, L, W = F_up.shape
    bc = min(block_columns, B)
    pad = (-B) % bc
    dtype = F_up.dtype
    col_g = sc.inv_g is not None
    col_ftoa = sc.f_toa.shape[0] > 1
    inv_g = sc.inv_g
    f_toa = sc.f_toa
    if done is None:
        done_col = jnp.zeros((B, 1), dtype)
    else:
        done_col = done.astype(dtype)[:, None]
    if fused:
        ohs, tab = kappa
        if _OHS_LAYOUT == "batch":
            # layer-major layout for the kernel's batched kappa dot
            ohs = jnp.moveaxis(ohs, 0, 1)             # (L, B, K)
        # else "layer": built layer-major upstream (solver kap_fn ->
        # tables.layer_interp_weights layer_major=True) — no slab
        # transpose in the XLA graph
        if _KAPPA_DOT_MODE in ("padk", "padk32"):
            align = 128 if _KAPPA_DOT_MODE == "padk" else 32
            Kp = -(-ohs.shape[-1] // align) * align
            ohs = jnp.pad(ohs, ((0, 0), (0, 0),
                                (0, Kp - ohs.shape[-1])))
            tab = jnp.pad(tab, ((0, 0), (0, Kp - tab.shape[1]),
                                (0, 0)))
        if _KAPPA_DOT_MODE == "tabT":
            tab = jnp.swapaxes(tab, 1, 2)             # (L, W, K)
        K = ohs.shape[-1]
    if pad:
        def padrows(x):
            return jnp.concatenate([x, x[-1:].repeat(pad, 0)])
        temps = padrows(temps)
        F_up = padrows(F_up)
        F_down = padrows(F_down)
        done_col = padrows(done_col)
        if col_g:
            inv_g = padrows(inv_g)
        if col_ftoa:
            f_toa = padrows(f_toa)
        if fused:
            ohs = jnp.concatenate(
                [ohs, ohs[:, -1:].repeat(pad, 1)], axis=1)
        else:
            kappa = padrows(kappa)
    Bp = B + pad

    vec = partial(pl.BlockSpec, (1, W), lambda i: (0, 0),
                  memory_space=pltpu.VMEM)
    col = partial(pl.BlockSpec, (bc, 1), lambda i: (i, 0),
                  memory_space=pltpu.VMEM)
    slab = partial(pl.BlockSpec, (bc, L, W), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM)
    if fused:
        tab_block = ((L, W, K) if _KAPPA_DOT_MODE == "tabT"
                     else (L, K, W))
        kappa_specs = [
            pl.BlockSpec((L, bc, K), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tab_block, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        kappa_args = (ohs, tab)
    else:
        kappa_specs = [slab()]
        kappa_args = (kappa,)
    invg_specs = [col()] if col_g else []
    invg_args = (inv_g,) if col_g else ()
    if sc.planck_tab is not None:
        nTp = sc.planck_tab.shape[0]
        planck_specs = [pl.BlockSpec((nTp, W), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)]
        planck_args = (sc.planck_tab,)
        planck = sc.planck_idx
    else:
        planck_specs, planck_args, planck = [], (), None
    ftoa_spec = (pl.BlockSpec((bc, W), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
                 if col_ftoa else vec())
    out = pl.pallas_call(
        partial(kernel, L=L, fused=fused, col_g=col_g,
                col_ftoa=col_ftoa, planck=planck),
        grid=(Bp // bc,),
        in_specs=[
            pl.BlockSpec((1, L - 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            col(),
            *invg_specs,
            pl.BlockSpec((bc, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *kappa_specs,
            *planck_specs,
            slab(), slab(),
            vec(), vec(), ftoa_spec, vec(),
        ],
        out_specs=[
            slab(), slab(),
            pl.BlockSpec((bc, 4, L - 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, L, W), dtype),
            jax.ShapeDtypeStruct((Bp, L, W), dtype),
            jax.ShapeDtypeStruct((Bp, 4, L - 1), dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(dtf, done_col, *invg_args, temps, *kappa_args, *planck_args,
      F_up, F_down, sc.lam, sc.sigma, f_toa, sc.tw)
    F_up_new, F_down_new, sums = out
    if pad:
        F_up_new = F_up_new[:B]
        F_down_new = F_down_new[:B]
        sums = sums[:B]
    return F_up_new, F_down_new, sums


def emit_sweep_pallas(temps, F_up, F_down, k_all, sc: SweepConsts,
                      pressures, params: PhysicsParams,
                      block_columns: int = 8, interpret: bool = False,
                      done=None, bins_axis: str = ""):
    """Fused batched emit sweep: (B, L) temps, (B, L, W) state.

    Returns (F_up_new, F_down_new, temps_new, dT) — identical results
    to ``jax.vmap(rt.sweeps.emit_sweep)`` up to float summation order
    (cross-checked in ``tests/test_sweep_pallas.py``).
    """
    F_up_new, F_down_new, sums = _run_sweep(
        _emit_kernel, sc.dtf_emit, temps, k_all, F_up, F_down, sc,
        block_columns, interpret, done=done)
    if bins_axis:
        # inside shard_map with the spectral grid sharded: the kernel
        # produced per-shard partial quadratures — one psum over ICI
        # completes the bolometric integral (`twostream.py:16-20`)
        sums = jax.lax.psum(sums, bins_axis)
    p = pressures
    T1 = temps[:, 1:]
    T2 = jnp.concatenate([temps[:, 2:], temps[:, -1:]], axis=1)
    p1 = p[1:]
    p2 = jnp.concatenate([p[2:], (p[-1] * p[-2] / p[-3])[None]])
    bu2, bd2, bu1, bd1 = sums[:, 0], sums[:, 1], sums[:, 2], sums[:, 3]
    div, dz = physics.div_bol_net_flux(bu2, bd2, bu1, bd1,
                                       T1, T2, p1, p2, params)
    dt = physics.radiative_timestep(T1, T2, p1, p2, div, dz, params)
    dT_swept = physics.delta_temperature(div, dt, T1, p1, p2, params)
    dT = jnp.concatenate([jnp.zeros_like(temps[:, :1]), dT_swept], axis=1)
    return F_up_new, F_down_new, temps - dT, dT


def absorb_sweep_pallas(temps, F_up, F_down, k_all, sc: SweepConsts,
                        pressures, params: PhysicsParams,
                        block_columns: int = 8, interpret: bool = False,
                        done=None, bins_axis: str = ""):
    """Fused batched absorb sweep (mirror of :func:`emit_sweep_pallas`)."""
    F_up_new, F_down_new, sums = _run_sweep(
        _absorb_kernel, sc.dtf_absorb, temps, k_all, F_up, F_down, sc,
        block_columns, interpret, done=done)
    if bins_axis:
        sums = jax.lax.psum(sums, bins_axis)
    p = pressures
    T1 = temps[:, :-1]
    T2 = temps[:, 1:]
    p1 = p[:-1]
    p2 = p[1:]
    bu2, bd2, bu1, bd1 = sums[:, 0], sums[:, 1], sums[:, 2], sums[:, 3]
    div, dz = physics.div_bol_net_flux(bu2, bd2, bu1, bd1,
                                       T1, T2, p1, p2, params)
    dt = physics.radiative_timestep(T1, T2, p1, p2, div, dz, params)
    dT_swept = physics.delta_temperature(div, dt, T1, p1, p2, params)
    dT = jnp.concatenate([dT_swept, jnp.zeros_like(temps[:, :1])], axis=1)
    return F_up_new, F_down_new, temps - dT, dT
