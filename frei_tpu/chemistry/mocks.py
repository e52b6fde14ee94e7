"""Constant-VMR mock chemistry.

Drop-in stand-in for the equilibrium solver, mirroring the reference's
mock FastChem path (`/root/reference/frei/chemistry.py:207-246`): every
species gets a constant volume mixing ratio of 1.5e-3, converted to a
mass mixing ratio with the species mass.  This is what the reference's
golden integration test exercises when pyfastchem is absent, and it is
the degraded mode frei_tpu falls back to when no chemistry tables are
loaded.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["MockChemistry", "MOCK_VMR"]

MOCK_VMR = 1.5e-3  # `chemistry.py:243`


class MockChemistry:
    """Constant-VMR chemistry model.

    Parameters
    ----------
    species_masses_g : array (S,)
        Mass of each opacity species in grams.
    m_bar_g : float
        Mean molecular weight in grams.
    """

    def __init__(self, species_masses_g, m_bar_g):
        self.species_masses_g = jnp.asarray(species_masses_g)
        self.m_bar_g = float(m_bar_g)

    def vmr(self, temperatures, pressures_cgs):
        """Volume mixing ratios, shape (S,) + T.shape."""
        shape = (self.species_masses_g.shape[0],) + jnp.shape(temperatures)
        return jnp.full(shape, MOCK_VMR, dtype=jnp.result_type(temperatures))

    def mmr(self, temperatures, pressures_cgs):
        """Mass mixing ratios ``vmr * m_species / m_bar``
        (`chemistry.py:197-199`), shape (S,) + T.shape."""
        v = self.vmr(temperatures, pressures_cgs)
        scale = (self.species_masses_g / self.m_bar_g).astype(v.dtype)
        return v * scale.reshape(scale.shape + (1,) * (v.ndim - 1))

    def layer_ln_mmr_tables(self, pressures_cgs):
        """Layer-factored form for the fused iteration kernel: a
        (log10 T grid, (L, nTc, S) ln-MMR table) pair such that
        ``mmr = exp(interp_logT(table[l]))`` with clipped
        interpolation.  Constant chemistry = a trivial 2-point grid."""
        import numpy as np
        L = np.shape(pressures_cgs)[0]
        S = self.species_masses_g.shape[0]
        ln_mmr = jnp.log(MOCK_VMR * self.species_masses_g / self.m_bar_g)
        tab = jnp.broadcast_to(ln_mmr[None, None, :], (L, 2, S))
        return jnp.asarray([0.0, 10.0]), tab
