"""Trajectory parity: jitted scanned solver vs the loop-based oracle.

``tests/reference_impl.py`` is a literal, slow, float64 transcription
of the reference algorithm (per-layer Python loops, in-place flux
updates).  These tests pin the frei_tpu solver to it step for step —
sweeps, multi-timestep trajectories, convergence behavior — far
tighter than the golden tolerances.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from frei_tpu import Grid, Planet, load_example_opacity
from frei_tpu.constants import u_amu
from frei_tpu.opacity.rayleigh import rayleigh_total

from frei_tpu.rt.sweeps import absorb_sweep, emit_sweep
from frei_tpu.stellar.irradiation import f_toa

from reference_impl import MiniFrei


@pytest.fixture(scope="module")
def setup():
    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=80, n_layers=12, T_ref=2400.0,
                dtype=jnp.float64)
    stack = load_example_opacity(grid, scale_factor=1.0, dtype=jnp.float64)
    grid.load_opacities(opacities=stack)
    lam_cm = grid.rt_grid.lam_cm
    sigma = rayleigh_total(lam_cm, planet.m_bar)
    F_toa = np.asarray(f_toa(jnp.asarray(lam_cm), planet.T_star,
                             planet.a_rstar))
    mini = MiniFrei(
        lam_cm=lam_cm, pressures_cgs=grid.rt_grid.pressures_cgs,
        k_table=np.asarray(stack.values)[0],
        temps_axis=np.asarray(stack.temps),
        press_axis_cgs=np.asarray(stack.press_cgs),
        mmr=1.5e-3 * 18.0 * u_amu / planet.m_bar,
        sigma_scat=sigma, F_toa=F_toa,
        g=planet.g, m_bar=planet.m_bar, alpha=planet.alpha)
    return planet, grid, mini


def _sweep_inputs(grid, planet, temps):
    g = grid.rt_grid
    k = np.asarray(grid._kappa_fn(jnp.asarray(temps),
                                  jnp.asarray(g.pressures_cgs)))
    return dict(
        k_all=jnp.asarray(k),
        sigma_scat=grid._consts.sigma_scat,
        F_toa=grid._consts.F_toa,
        lam_cm=grid._consts.lam_cm,
        trapz_w=grid._consts.trapz_w,
        pressures=grid._consts.pressures,
        params=planet.physics_params(),
    )


@pytest.mark.parametrize("associative", [True, False])
def test_emit_sweep_matches_oracle(setup, associative):
    planet, grid, mini = setup
    L, W = 12, 80
    rng = np.random.RandomState(3)
    temps = np.asarray(grid.rt_grid.init_temperatures) * rng.uniform(
        0.95, 1.05, L)
    F_up = rng.uniform(0, 1e12, (L, W))
    F_down = rng.uniform(0, 1e12, (L, W))

    want = mini.emit(temps, F_up, F_down)
    got = emit_sweep(jnp.asarray(temps), jnp.asarray(F_up),
                     jnp.asarray(F_down), associative=associative,
                     **_sweep_inputs(grid, planet, temps))
    np.testing.assert_allclose(got.F_up, want[0], rtol=1e-10)
    np.testing.assert_allclose(got.F_down, want[1], rtol=1e-10)
    np.testing.assert_allclose(got.temps, want[2], rtol=1e-9)
    np.testing.assert_allclose(got.dT, want[3], rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(got.dtaus, want[4], rtol=1e-12)


@pytest.mark.parametrize("associative", [True, False])
def test_absorb_sweep_matches_oracle(setup, associative):
    planet, grid, mini = setup
    L, W = 12, 80
    rng = np.random.RandomState(7)
    temps = np.asarray(grid.rt_grid.init_temperatures) * rng.uniform(
        0.95, 1.05, L)
    F_up = rng.uniform(0, 1e12, (L, W))
    F_down = rng.uniform(0, 1e12, (L, W))

    want = mini.absorb(temps, F_up, F_down)
    got = absorb_sweep(jnp.asarray(temps), jnp.asarray(F_up),
                       jnp.asarray(F_down), associative=associative,
                       **_sweep_inputs(grid, planet, temps))
    np.testing.assert_allclose(got.F_up, want[0], rtol=1e-10)
    np.testing.assert_allclose(got.F_down, want[1], rtol=1e-10)
    np.testing.assert_allclose(got.temps, want[2], rtol=1e-9)
    np.testing.assert_allclose(got.dT, want[3], rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(got.dtaus, want[4], rtol=1e-12)


@pytest.mark.parametrize("n_timesteps", [1, 5, 25])
def test_multistep_trajectory_matches_oracle(setup, n_timesteps):
    planet, grid, mini = setup
    T0 = np.asarray(grid.rt_grid.init_temperatures)
    want_flux, want_temps, want_hist, want_dtaus, *_ = (
        mini.emission_spectrum(T0, n_timesteps=n_timesteps))
    spec, temps, hist, dtaus = grid.emission_spectrum(
        n_timesteps=n_timesteps)
    np.testing.assert_allclose(spec.flux_cgs, want_flux, rtol=1e-9)
    np.testing.assert_allclose(temps, want_temps, rtol=1e-10)
    assert hist.shape == want_hist.shape
    np.testing.assert_allclose(hist, want_hist, rtol=1e-10)
    np.testing.assert_allclose(dtaus, want_dtaus, rtol=1e-10)


def test_associative_equals_sequential_scan(setup):
    planet, grid, mini = setup
    spec_a, temps_a, *_ = grid.emission_spectrum(
        n_timesteps=4, associative=True)
    spec_s, temps_s, *_ = grid.emission_spectrum(
        n_timesteps=4, associative=False)
    np.testing.assert_allclose(spec_a.flux_cgs, spec_s.flux_cgs, rtol=1e-10)
    np.testing.assert_allclose(temps_a, temps_s, rtol=1e-12)


def test_full_golden_config_trajectory_matches_oracle():
    """Trajectory parity at the FULL golden configuration (500 bins x
    30 layers — the small-grid fixtures miss table-edge cases: the
    initial temperatures sit exactly on the opacity table's
    temperature axis, see opacity.tables._axis_weights).  25 RC
    iterations, float64."""
    from frei_tpu import Grid, Planet, load_example_opacity
    from frei_tpu.constants import u_amu
    from frei_tpu.opacity.rayleigh import rayleigh_total
    from frei_tpu.stellar.irradiation import f_toa_np
    from reference_impl import MiniFrei

    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, T_ref=2400.0, dtype=jnp.float64)
    grid.load_opacities(opacities=load_example_opacity(
        grid, scale_factor=1.0, dtype=jnp.float64))
    stack = grid.opacities
    lam_cm = grid.rt_grid.lam_cm
    mini = MiniFrei(
        lam_cm=lam_cm, pressures_cgs=grid.rt_grid.pressures_cgs,
        k_table=np.asarray(stack.values)[0],
        temps_axis=np.asarray(stack.temps),
        press_axis_cgs=np.asarray(stack.press_cgs),
        mmr=1.5e-3 * 18.0 * u_amu / planet.m_bar,
        sigma_scat=rayleigh_total(lam_cm, planet.m_bar),
        F_toa=f_toa_np(lam_cm, planet.T_star, planet.a_rstar),
        g=planet.g, m_bar=planet.m_bar, alpha=planet.alpha)
    T0 = np.asarray(grid.rt_grid.init_temperatures)
    want_flux, want_T, *_ = mini.emission_spectrum(T0, n_timesteps=25)
    spec, temps, *_ = grid.emission_spectrum(n_timesteps=25)
    np.testing.assert_allclose(spec.flux_cgs, want_flux, rtol=1e-9)
    np.testing.assert_allclose(temps, want_T, rtol=1e-9)
