"""Reference-parity chemistry entry point.

Drop-in functional equivalent of the reference ``chemistry()``
(`/root/reference/frei/chemistry.py:114-205`): takes temperatures,
pressures and a collection of opacity isotopologue names, returns a
dict of mass mixing ratios (optionally also volume mixing ratios) per
isotopologue — computed by the JAX equilibrium solver instead of the
external C++ FastChem.
"""

from __future__ import annotations

import numpy as np

from .. import constants as const
from ..units import to_barye, to_kelvin
from .fastchem import FastChemJAX
from .mocks import MockChemistry

__all__ = ["chemistry"]


def chemistry(temperatures, pressures, species, return_vmr=False,
              m_bar=2.4 * const.m_p, mode="exact"):
    """Equilibrium mass mixing ratios for each isotopologue.

    Parameters
    ----------
    temperatures : array or Quantity
        Layer temperatures [K].
    pressures : array or Quantity
        Layer pressures; plain floats in bar.
    species : iterable of str
        Isotopologue names (opacity-table keys, e.g. "1H2-16O").
    return_vmr : bool
        Also return volume mixing ratios (`chemistry.py:179-204`).
    m_bar : float or Quantity
        Mean molecular weight; plain floats in grams.
    mode : "exact" or "table" or "mock"
        Solver mode (see :class:`FastChemJAX`).

    Returns
    -------
    mmr : dict of isotopologue -> ndarray
    vmr : dict (only if ``return_vmr``)
    """
    import jax

    T = np.atleast_1d(to_kelvin(temperatures)).astype(float)
    P_cgs = np.atleast_1d(to_barye(pressures)).astype(float)
    m_bar_g = float(m_bar) if not hasattr(m_bar, "unit") else \
        float(m_bar.to_value("g"))
    species = list(species)
    if mode == "mock":
        from .names import iso_to_mass_g
        model = MockChemistry(np.array([iso_to_mass_g(s) for s in species]),
                              m_bar_g)
    else:
        model = FastChemJAX(species, m_bar_g, mode=mode)
    with jax.enable_x64(True):
        vmr = np.asarray(model.vmr(T, P_cgs))
        # mmr is vmr x (m_species / m_bar) — derive it instead of
        # calling model.mmr(), which re-runs the full equilibrium
        # solve a second time in 'exact' mode
        masses = np.asarray(getattr(model, "species_masses_g",
                                    getattr(model, "_masses_g", None)),
                            dtype=float)
        mmr = vmr * (masses / m_bar_g).reshape(
            (-1,) + (1,) * (vmr.ndim - 1))
    mmr_d = {s: mmr[i] for i, s in enumerate(species)}
    if return_vmr:
        return mmr_d, {s: vmr[i] for i, s in enumerate(species)}
    return mmr_d
