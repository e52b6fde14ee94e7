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


@pytest.mark.slow   # 10 K-loop float64 oracle transcription
def test_standalone_emit_absorb_reference_conventions():
    """Standalone `emit` / `absorb` reproduce the reference's public
    call conventions (`/root/reference/frei/twostream.py:290-293,
    336-339,465-475`): self-seeded flux state (F_down[-1] = F_TOA;
    absorb also F_up[0] = pi B(T0)), own timestep loop stopping at
    max|dT| < convergence_thresh (default 10 K), and equivalence with
    a manual loop of single sweeps from the same seeds."""
    import jax.numpy as jnp

    from frei_tpu import Grid, Planet, emit, absorb, load_example_opacity
    from frei_tpu.ops.planck import bb_flux
    from frei_tpu.rt.sweeps import absorb_sweep, emit_sweep

    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=64, n_layers=10, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(opacities=load_example_opacity(
        grid, scale_factor=1.0, dtype=jnp.float64))
    consts, params = grid._consts, planet.physics_params()
    T0 = jnp.asarray(grid.rt_grid.init_temperatures)

    r = absorb(T0, consts, params, grid._kappa_fn, n_timesteps=4,
               convergence_thresh=0.0)   # force all 4 steps
    assert int(r.n_history) == 5

    # manual replication from the reference's self-seeds
    L, W = 10, 64
    Fu = jnp.zeros((L, W)).at[0].set(bb_flux(T0[0], consts.lam_cm))
    Fd = jnp.zeros((L, W)).at[-1].set(consts.F_toa)
    temps = T0
    kw = dict(sigma_scat=consts.sigma_scat, F_toa=consts.F_toa,
              lam_cm=consts.lam_cm, trapz_w=consts.trapz_w,
              pressures=consts.pressures, params=params)
    for _ in range(4):
        s = absorb_sweep(temps, Fu, Fd, grid._kappa_fn(
            temps, consts.pressures), **kw)
        temps, Fu, Fd = s.temps, s.F_up, s.F_down
    np.testing.assert_allclose(np.asarray(r.final_temps),
                               np.asarray(temps), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r.F_down),
                               np.asarray(Fd), rtol=1e-12)

    # emit: seeds F_down[-1] only; convergence stop fires early at a
    # loose threshold
    re_full = emit(T0, consts, params, grid._kappa_fn, n_timesteps=50,
                   convergence_thresh=1e9)
    assert int(re_full.n_history) == 2          # one step "converges"
    re2 = emit(T0, consts, params, grid._kappa_fn, n_timesteps=3,
               convergence_thresh=0.0)
    assert int(re2.n_history) == 4
    assert np.all(np.isfinite(np.asarray(re2.F_up)))
    # the default-seed state: manual emit_sweep from zeros+F_TOA seed
    Fu0 = jnp.zeros((L, W))
    Fd0 = jnp.zeros((L, W)).at[-1].set(consts.F_toa)
    s1 = emit_sweep(T0, Fu0, Fd0, grid._kappa_fn(T0, consts.pressures),
                    **kw)
    re1 = emit(T0, consts, params, grid._kappa_fn, n_timesteps=1,
               convergence_thresh=0.0)
    np.testing.assert_allclose(np.asarray(re1.final_temps),
                               np.asarray(s1.temps), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(re1.dtaus),
                               np.asarray(s1.dtaus), rtol=1e-12)
