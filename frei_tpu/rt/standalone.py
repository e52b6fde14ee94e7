"""Standalone ``emit`` / ``absorb`` drivers with the reference's
public-call conventions.

The reference exposes ``emit`` and ``absorb`` as user-facing functions
that (a) self-seed the flux state when called without one —
``F_down[-1] = F_TOA`` in both, plus ``F_up[0] = pi B(T[0])`` in
``absorb`` (`/root/reference/frei/twostream.py:336-339,465-475`) —
and (b) run their own multi-timestep loop that stops when
``max|dT| < convergence_thresh`` (default 10 K,
`twostream.py:291-293,414-416`).  The Grid driver instead calls them
one timestep at a time with caller-maintained state (`core.py:269-299`
-> ``frei_tpu.rt.solver``).  This module provides the standalone
convention as a jitted ``lax.while_loop`` over
:func:`frei_tpu.rt.sweeps.emit_sweep` / ``absorb_sweep``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.planck import bb_flux
from .physics import PhysicsParams
from .solver import RTConstants
from .sweeps import absorb_sweep, emit_sweep

__all__ = ["StandaloneResult", "emit", "absorb"]


class StandaloneResult(NamedTuple):
    """Mirror of the reference return tuple (`twostream.py:417-421`)."""

    F_up: jnp.ndarray          # (L, W)
    F_down: jnp.ndarray        # (L, W)
    final_temps: jnp.ndarray   # (L,)
    temp_history: jnp.ndarray  # (n_timesteps + 1, L); row 0 = input
    n_history: jnp.ndarray     # valid history rows (timesteps run + 1)
    dtaus: jnp.ndarray         # (L, W) from the final sweep
    dT: jnp.ndarray            # (L,) last temperature change


@partial(jax.jit,
         static_argnames=("kappa_all", "n_timesteps", "associative",
                          "_direction"))
def _run(init_temps, consts: RTConstants, params: PhysicsParams,
         kappa_all: Callable, fluxes_up, fluxes_down,
         n_timesteps: int, convergence_thresh, associative: bool,
         _direction: str) -> StandaloneResult:
    L = init_temps.shape[0]
    dtype = init_temps.dtype
    params = PhysicsParams(
        g=jnp.asarray(params.g, dtype),
        m_bar=jnp.asarray(params.m_bar, dtype),
        alpha=jnp.asarray(params.alpha, dtype),
        n_dof=params.n_dof,
    )
    sweep = emit_sweep if _direction == "emit" else absorb_sweep
    sweep_kw = dict(
        sigma_scat=consts.sigma_scat, F_toa=consts.F_toa,
        lam_cm=consts.lam_cm, trapz_w=consts.trapz_w,
        pressures=consts.pressures, params=params,
        associative=associative,
    )
    thresh = jnp.asarray(convergence_thresh, dtype)

    def body(carry):
        j, temps, Fu, Fd, hist, dT, dtaus, done = carry
        k = kappa_all(temps, consts.pressures)
        r = sweep(temps, Fu, Fd, k, **sweep_kw)
        hist = hist.at[j + 1].set(r.temps)
        new_done = jnp.max(jnp.abs(r.dT)) < thresh
        return (j + 1, r.temps, r.F_up, r.F_down, hist, r.dT,
                r.dtaus, new_done)

    def cond(carry):
        j, done = carry[0], carry[-1]
        return (j < n_timesteps) & jnp.logical_not(done)

    hist0 = jnp.zeros((n_timesteps + 1, L), dtype).at[0].set(init_temps)
    W = consts.lam_cm.shape[0]
    carry0 = (jnp.asarray(0, jnp.int32), init_temps,
              jnp.asarray(fluxes_up, dtype),
              jnp.asarray(fluxes_down, dtype), hist0,
              jnp.zeros((L,), dtype), jnp.zeros((L, W), dtype),
              jnp.asarray(False))
    j, temps, Fu, Fd, hist, dT, dtaus, _ = lax.while_loop(
        cond, body, carry0)
    return StandaloneResult(F_up=Fu, F_down=Fd, final_temps=temps,
                            temp_history=hist, n_history=j + 1,
                            dtaus=dtaus, dT=dT)


def _default_fluxes(init_temps, consts: RTConstants, seed_bottom_up):
    dtype = init_temps.dtype
    L = init_temps.shape[0]
    W = consts.lam_cm.shape[0]
    F_up = jnp.zeros((L, W), dtype)
    if seed_bottom_up:
        # absorb's self-seed: F_up[0] = pi B(T[0]) (`twostream.py:470`)
        F_up = F_up.at[0].set(
            bb_flux(init_temps[0], consts.lam_cm).astype(dtype))
    # both directions seed F_down[-1] = F_TOA (`twostream.py:339,474`)
    F_down = jnp.zeros((L, W), dtype).at[-1].set(
        consts.F_toa.astype(dtype))
    return F_up, F_down


def emit(init_temps, consts: RTConstants, params: PhysicsParams,
         kappa_all: Callable, n_timesteps: int = 50,
         convergence_thresh: float = 10.0, fluxes_up=None,
         fluxes_down=None, associative: bool = False) -> StandaloneResult:
    """Standalone multi-timestep emission driver (reference ``emit``,
    `twostream.py:290-421`): bottom-to-top sweeps until
    ``max|dT| < convergence_thresh`` (default 10 K) or ``n_timesteps``
    (default 50).  When the flux state is omitted it is self-seeded
    with zeros + ``F_down[-1] = F_TOA`` (`twostream.py:336-339`)."""
    init_temps = jnp.asarray(init_temps)
    dFu, dFd = _default_fluxes(init_temps, consts, seed_bottom_up=False)
    return _run(init_temps, consts, params, kappa_all,
                dFu if fluxes_up is None else fluxes_up,
                dFd if fluxes_down is None else fluxes_down,
                int(n_timesteps), convergence_thresh, associative,
                "emit")


def absorb(init_temps, consts: RTConstants, params: PhysicsParams,
           kappa_all: Callable, n_timesteps: int = 50,
           convergence_thresh: float = 10.0, fluxes_up=None,
           fluxes_down=None, associative: bool = False) -> StandaloneResult:
    """Standalone multi-timestep absorption driver (reference
    ``absorb``, `twostream.py:424-550`): top-to-bottom sweeps with the
    self-seeded state ``F_up[0] = pi B(T[0])``, ``F_down[-1] = F_TOA``
    (`twostream.py:465-475`)."""
    init_temps = jnp.asarray(init_temps)
    dFu, dFd = _default_fluxes(init_temps, consts, seed_bottom_up=True)
    return _run(init_temps, consts, params, kappa_all,
                dFu if fluxes_up is None else fluxes_up,
                dFd if fluxes_down is None else fluxes_down,
                int(n_timesteps), convergence_thresh, associative,
                "absorb")
