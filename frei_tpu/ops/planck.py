"""Planck blackbody spectral radiance, unitless CGS.

Equivalent of the reference's ``BB`` closure
(`/root/reference/frei/twostream.py:46-67`), as a pure jittable
function of (temperature, wavelength) instead of a function factory.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as const

__all__ = ["planck_lambda", "planck_lambda_np", "bb_flux"]


def planck_lambda(temperature, lam_cm):
    """Planck spectral radiance B_lambda(T) in erg s^-1 cm^-3 (per sr).

    ``B = 2 h c^2 / lam^5 / expm1(h c / (lam k_B T))``
    (`twostream.py:64-67`).  Broadcasts over both arguments.

    Float32-safe by construction: for very cold layers the exponent
    overflows to +inf and the result cleanly underflows to 0 (the
    physical limit) rather than producing NaNs.
    """
    lam_cm = jnp.asarray(lam_cm)
    x = const.hc_over_k / (lam_cm * temperature)
    return 2.0 * const.h * const.c ** 2 / lam_cm ** 5 / jnp.expm1(x)


def planck_lambda_np(temperature, lam_cm):
    """Host (numpy, float64) twin of :func:`planck_lambda`, for
    precomputing per-configuration constants like the TOA irradiation
    without touching the device or the x64 config flag."""
    lam_cm = np.asarray(lam_cm, dtype=np.float64)
    x = const.hc_over_k / (lam_cm * temperature)
    return 2.0 * const.h * const.c ** 2 / lam_cm ** 5 / np.expm1(x)


def bb_flux(temperature, lam_cm):
    """Hemispheric blackbody flux ``pi * B_lambda`` [erg s^-1 cm^-3],
    the seed used for the bottom boundary of the ``absorb`` sweep
    (`twostream.py:470`)."""
    return jnp.pi * planck_lambda(temperature, lam_cm)
