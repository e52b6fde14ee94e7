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


@pytest.mark.slow   # solver-iteration perf property, not parity
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


@pytest.mark.slow
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


@pytest.mark.slow   # chem table build + dense T sweep
def test_layer_mmr_interp_matches_generic_path():
    """The hot-loop layer-factored MMR evaluator (P-interp hoisted,
    one-hot T contraction) equals the generic bilinear table path
    ``mmr(T, P)`` to float32 rounding — including batched (B, L)
    temperatures and out-of-range temperatures (both clamp)."""
    m_bar = 2.4 * 1.67262192369e-24
    species = ["1H2-16O", "Na", "K"]
    # coarse table: the parity under test (layer-factored vs generic
    # bilinear evaluation of the SAME table) is grid-size independent
    chem = FastChemJAX(species, m_bar, mode="table", grid_shape=(16, 8))
    press = jnp.asarray(np.logspace(-6, 2, 30) * BAR_TO_CGS,
                        jnp.float32)
    rng = np.random.RandomState(7)
    # in-range, below-range, above-range temperatures
    T = jnp.asarray(
        np.concatenate([rng.uniform(900.0, 4800.0, (6, 30)),
                        np.full((1, 30), 150.0),
                        np.full((1, 30), 9000.0)]), jnp.float32)
    mmr_fn = chem.layer_mmr_interp(press)
    got = np.asarray(mmr_fn(T))
    want = np.asarray(chem.mmr(T, press[None, :].repeat(8, 0)))
    # float32: exp() of two differently-rounded ln-interpolations
    # (bilinear gather vs hoisted-P one-hot contraction)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    exact = FastChemJAX(species, m_bar, mode="exact")
    with pytest.raises(AttributeError, match="table mode"):
        exact.layer_mmr_interp(press)


def test_golden_vmr_profiles(profile_solution):
    """Point-wise log-VMR profiles for 14 species over the full
    reference T-P profile vs the committed regression table
    (tests/data/chem_profile_golden.npz, regenerated by
    tools/build_chem_regression.py) — much stronger than the 4
    max-VMR goldens: any solver/abundance/logK drift shows up
    point-wise at rtol 1e-3."""
    from pathlib import Path
    table, ln_p, _ = profile_solution
    d = np.load(Path(__file__).parent / "data" /
                "chem_profile_golden.npz")
    idx = [table.species_index(str(h)) for h in d["species"]]
    assert all(i >= 0 for i in idx)
    np.testing.assert_allclose(P_BAR, d["P_bar"])
    got = (ln_p[:, idx] - np.log(P_BAR)[:, None]) / np.log(10.0)
    # rtol on the VMR itself ~ atol on log10(VMR) / ln(10); 1e-3
    # relative in VMR == ~4.3e-4 in log10
    np.testing.assert_allclose(got, d["log10_vmr"], atol=5e-4)


def test_residual_history_convergence():
    """The Gauss-Seidel residual history decreases and the final
    pressure-closure residual is tight (VERDICT round-1 item: the
    history was computed and discarded; now it is telemetry and a
    gate)."""
    table = load_chem_table()
    ln_p, z, r = equilibrium_log_pressures(
        table, jnp.asarray(T_K[::7]), jnp.asarray(P_BAR[::7]),
        return_residuals=True)
    r = np.asarray(r)
    assert r.shape == (60,)
    assert r[-1] < 1e-8, r[-1]
    assert r[-1] < r[0] * 1e-6         # actually converging, not stuck


@pytest.mark.slow   # full-grid table build
def test_table_mode_reports_convergence():
    m_bar = 2.4 * 1.67262192369e-24
    chem = FastChemJAX(["1H2-16O"], m_bar, mode="table",
                       grid_shape=(12, 8))
    assert chem.table_residual < 1e-6


@pytest.mark.slow
def test_exact_mode_warm_start_hot_loop():
    """The exact-mode hot-loop pattern: thread the warm-start state
    through an RC-style iteration where temperatures drift a few K per
    step — each warm re-solve with 8 sweeps must track the full
    60-sweep cold solve."""
    m_bar = 2.4 * 1.67262192369e-24
    species = ["1H2-16O", "Na", "K"]
    chem = FastChemJAX(species, m_bar, mode="exact")
    P_cgs = jnp.asarray(P_BAR[::11] * BAR_TO_CGS)
    T = np.asarray(T_K[::11])
    _, z, _ = chem.vmr_with_state(jnp.asarray(T), P_cgs)
    for step in range(3):
        T = T * 1.004          # ~10 K drift per iteration
        v_warm, z, r = chem.vmr_with_state(jnp.asarray(T), P_cgs,
                                           z0=z, n_sweeps=16)
        v_cold = chem.vmr(jnp.asarray(T), P_cgs)
        np.testing.assert_allclose(np.asarray(v_warm),
                                   np.asarray(v_cold), rtol=1e-3)
        assert float(np.asarray(r)[-1]) < 1e-7
    with pytest.raises(AttributeError):
        FastChemJAX(["1H2-16O"], m_bar, mode="table",
                    grid_shape=(8, 6)).vmr_with_state(T, P_cgs)


def test_hot_loop_mmr_fn_dispatch():
    """hot_loop_mmr_fn is an explicit capability dispatch: factored
    for table mode, generic otherwise — and a custom model whose own
    layer_mmr_interp is broken must fail LOUDLY, not silently demote
    to the gather path (exception-driven dispatch bug, round-3
    review)."""
    from frei_tpu.chemistry.fastchem import hot_loop_mmr_fn

    press = jnp.asarray(np.logspace(-3, 2, 5))

    class Custom:                    # mmr-only duck type -> generic
        def mmr(self, temps, pressures_cgs):
            return jnp.ones((2,) + temps.shape)

    fn = hot_loop_mmr_fn(Custom(), press)
    assert fn(jnp.ones((3, 5))).shape == (2, 3, 5)

    class Broken:
        def mmr(self, temps, pressures_cgs):
            return temps

        def layer_mmr_interp(self, pressures_cgs):
            raise AttributeError("typo'd internal attribute")

    with pytest.raises(AttributeError, match="typo"):
        hot_loop_mmr_fn(Broken(), press)

    # exact-mode FastChemJAX: supports_layer_factoring() is False, so
    # dispatch returns the generic binding WITHOUT calling
    # layer_mmr_interp (which would raise)
    m_bar = 2.4 * 1.67262192369e-24
    exact = FastChemJAX(["1H2-16O"], m_bar, mode="exact")
    assert not exact.supports_layer_factoring()
    hot_loop_mmr_fn(exact, press)    # must not raise
