"""Equilibrium chemistry solver tests.

Golden targets are the reference's FastChem abundance assertions
(`frei/tests/test_chemistry.py:44-67`): maximum VMRs over the test T-P
profile for H2O / Na / K / TiO with rtol = 0.1, computed here by the
JAX Gauss-Seidel solver over the same thermochemical data.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from frei_tpu.chemistry.fastchem import (FastChemJAX, UNKNOWN_SPECIES,
                                         equilibrium_log_pressures,
                                         load_chem_table)
from frei_tpu.constants import BAR_TO_CGS

# reference test profile (`test_chemistry.py:12-13`)
P_BAR = np.logspace(-6, 2, 100)
T_K = 2400.0 * (P_BAR / 0.1) ** 0.1

GOLDEN_MAX_VMR = {
    "H2O1": 3e-4, "Na": 3e-6, "K": 1.8e-7, "O1Ti1": 1.4e-7,
}


@pytest.fixture(scope="module")
def profile_solution():
    table = load_chem_table()
    ln_p, z = equilibrium_log_pressures(
        table, jnp.asarray(T_K), jnp.asarray(P_BAR))
    return table, np.asarray(ln_p), np.asarray(z)


@pytest.mark.parametrize("hill,want", sorted(GOLDEN_MAX_VMR.items()))
def test_golden_max_abundances(profile_solution, hill, want):
    table, ln_p, _ = profile_solution
    i = table.species_index(hill)
    assert i != UNKNOWN_SPECIES
    vmr = np.exp(ln_p[:, i]) / P_BAR
    np.testing.assert_allclose(vmr.max(), want, rtol=0.1)


def test_conservation_and_pressure(profile_solution):
    """Mass action + element conservation + pressure closure hold to
    high precision at every profile point."""
    table, ln_p, z = profile_solution
    E = table.n_elements
    p = np.exp(ln_p)
    # pressure closure
    np.testing.assert_allclose(p.sum(axis=1), P_BAR, rtol=1e-8)
    # element conservation (relative to each element's total budget)
    nu = np.asarray(table.stoich)
    eps = np.asarray(table.abundances)
    M = np.exp(z[:, E])
    lhs = p[:, :E] + p[:, E:] @ nu
    rhs = eps[None, :] * M[:, None]
    ok = eps > 0
    np.testing.assert_allclose(lhs[:, ok], rhs[:, ok], rtol=1e-6)
    # charge balance: electron column sums to ~0 relative to ions
    ie = E - 1
    charge = p[:, ie] + p[:, E:] @ nu[:, ie]
    ion_scale = np.abs(p[:, E:]) @ np.abs(nu[:, ie])
    assert np.all(np.abs(charge) <= 1e-6 * np.maximum(ion_scale, 1e-300))


def test_h2_dominates_at_depth(profile_solution):
    table, ln_p, _ = profile_solution
    iH2 = table.species_index("H2")
    iH = table.species_index("H")
    # coolest point (T ~ 759 K): H overwhelmingly molecular
    assert np.exp(ln_p[0, iH2]) / P_BAR[0] > 0.4
    assert np.exp(ln_p[0, iH]) < np.exp(ln_p[0, iH2]) * 1e-3


def test_warm_start_converges_faster():
    table = load_chem_table()
    T = jnp.asarray(T_K[:10])
    P = jnp.asarray(P_BAR[:10])
    ln_p, z = equilibrium_log_pressures(table, T, P)
    # warm-started re-solve with a quarter of the sweeps reproduces the
    # full solve to well under the chemistry tables' own fidelity
    ln_p2, _ = equilibrium_log_pressures(table, T * 1.01, P, x0=z,
                                         n_sweeps=16)
    ln_p3, _ = equilibrium_log_pressures(table, T * 1.01, P, n_sweeps=60)
    np.testing.assert_allclose(ln_p2, ln_p3, rtol=1e-3, atol=2e-2)


def test_fastchem_model_table_vs_exact():
    """Table mode reproduces the exact solver within interpolation
    error for the in-range profile."""
    m_bar = 2.4 * 1.67262192369e-24
    species = ["1H2-16O", "Na", "K", "48Ti-16O"]
    exact = FastChemJAX(species, m_bar, mode="exact")
    tab = FastChemJAX(species, m_bar, mode="table")
    P_cgs = jnp.asarray(P_BAR * BAR_TO_CGS)
    T = jnp.asarray(T_K)
    v_exact = np.asarray(exact.vmr(T, P_cgs))
    v_tab = np.asarray(tab.vmr(T, P_cgs))
    np.testing.assert_allclose(v_tab, v_exact, rtol=0.05)


def test_unknown_species_raises():
    with pytest.raises(ValueError, match="not in chemistry tables"):
        FastChemJAX(["Xx9"], 1.0, mode="exact")
