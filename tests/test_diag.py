"""Dashboard, contribution function, telemetry, spectrum binning."""

import matplotlib

matplotlib.use("Agg")

import jax.numpy as jnp
import numpy as np
import pytest

from frei_tpu import Grid, Planet, load_example_opacity
from frei_tpu.diag.plot import contribution_function, dashboard
from frei_tpu.diag.telemetry import SolveMetrics
from frei_tpu.stellar.phoenix import (bin_spectrum_mean,
                                      get_binned_blackbody_spectrum)


@pytest.fixture(scope="module")
def solved_grid():
    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=48, n_layers=8, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(
        opacities=load_example_opacity(grid, scale_factor=1.0,
                                       dtype=jnp.float64))
    spec, temps, hist, dtaus = grid.emission_spectrum(n_timesteps=2)
    return grid, spec, temps, hist, dtaus


def test_contribution_function_normalized(solved_grid):
    grid, spec, temps, hist, dtaus = solved_grid
    cf = contribution_function(dtaus, grid.pressures, temps, grid.lam)
    assert cf.shape == (8, 48)
    np.testing.assert_allclose(cf.sum(axis=0), 1.0, rtol=1e-12)
    assert np.all(cf >= 0)


def test_dashboard_renders(solved_grid):
    grid, spec, temps, hist, dtaus = solved_grid
    fig, ax = grid.emission_dashboard(spec, temps, hist, dtaus,
                                      plot_phoenix=False)
    assert len(ax) == 5
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_dashboard_with_blackbody_comparison(solved_grid):
    grid, spec, temps, hist, dtaus = solved_grid
    bb = get_binned_blackbody_spectrum(2400.0, grid.wl_bins, grid.lam)
    assert bb.shape == (48,)
    fig, ax = dashboard(grid, spec, bb, dtaus, temps, hist)
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_phoenix_requires_expecto(solved_grid):
    grid, spec, temps, hist, dtaus = solved_grid
    from frei_tpu.stellar.phoenix import get_binned_phoenix_spectrum
    with pytest.raises(ImportError, match="expecto"):
        get_binned_phoenix_spectrum(2400.0, 24.79, grid.wl_bins, grid.lam)


def test_bin_spectrum_mean():
    wav = np.linspace(1.0, 2.0, 101)
    flux = np.full(101, 7.0)
    edges = np.array([1.0, 1.25, 1.5, 3.0])
    out = bin_spectrum_mean(flux, wav, edges, 5)
    np.testing.assert_allclose(out[:3], 7.0)
    np.testing.assert_allclose(out[3:], 0.0)   # zero-padded tail


def test_solve_metrics(solved_grid):
    grid, *_ = solved_grid
    m: SolveMetrics = grid.last_metrics
    assert m.n_iterations >= 1
    assert m.bins == 48
    assert "max|dT|" in m.summary()


def test_progress_callback(solved_grid, capsys):
    grid, *_ = solved_grid
    grid.emission_spectrum(n_timesteps=2, progress=True)
    out = capsys.readouterr().out
    assert "RC iter" in out and "max|dT|" in out


def test_checkpoint_roundtrip(solved_grid, tmp_path):
    from frei_tpu.io.checkpoint import load_solution, save_solution
    grid, *_ = solved_grid
    p = save_solution(tmp_path / "sol.npz", grid.last_result, note=[1, 2])
    state = load_solution(p)
    np.testing.assert_array_equal(state["final_temps"],
                                  np.asarray(grid.last_result.final_temps))
    np.testing.assert_array_equal(state["extra_note"], [1, 2])
    # resume from the saved profile
    planet = Planet.from_hot_jupiter()
    g2 = Grid(planet, n_wl_bins=48, n_layers=8,
              init_temperatures=state["final_temps"], dtype=jnp.float64)
    assert np.allclose(g2.init_temperatures, state["final_temps"])


@pytest.mark.slow
def test_irradiated_equilibrium_dashboard_end_to_end():
    """BASELINE config 4: irradiated atmosphere with equilibrium
    chemistry in the loop, multi-step RC iteration, and the full
    5-panel dashboard with a stellar comparison spectrum."""
    import matplotlib
    matplotlib.use("Agg")
    from frei_tpu.stellar.phoenix import get_binned_blackbody_spectrum

    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=48, n_layers=8, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(
        opacities=load_example_opacity(grid, scale_factor=1.0,
                                       dtype=jnp.float64),
        chemistry="equilibrium")
    spec, temps, hist, dtaus = grid.emission_spectrum(n_timesteps=8)
    assert np.all(np.isfinite(spec.flux_cgs))
    comparison = get_binned_blackbody_spectrum(
        2400.0, grid.wl_bins, grid.lam)
    from frei_tpu.diag.plot import dashboard
    fig, axes = dashboard(grid, spec, comparison, dtaus, temps, hist)
    assert len(axes) == 5
    import matplotlib.pyplot as plt
    plt.close(fig)


@pytest.mark.slow   # an 80-iteration equilibration solve; fast-lane
# telemetry coverage lives in test_solve_metrics / test_progress_callback
def test_flux_balance_telemetry():
    """The equilibration telemetry decreases with iteration (it does
    NOT reach zero: the scheme's dT criterion stops far short of
    strict flux constancy — see the flux_balance docstring) and is
    finite/positive on single and batched results."""
    from frei_tpu.diag.telemetry import flux_balance
    from frei_tpu.rt.solver import SolverConfig, solve_rc

    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=32, n_layers=7, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(opacities=load_example_opacity(
        grid, scale_factor=1.0, dtype=jnp.float64))
    T0 = jnp.asarray(grid.init_temperatures)
    imb = {}
    for n in (1, 80):
        res = solve_rc(T0, grid._consts, planet.physics_params(),
                       grid._kappa_fn,
                       SolverConfig(n_timesteps=n,
                                    n_zero_crossings=10 ** 6,
                                    convergence_dT=0.0))
        imb[n] = float(flux_balance(res, grid._consts.trapz_w))
    assert 0 < imb[80] < imb[1], imb
    # batched results give per-column values
    from frei_tpu.rt.solver import solve_rc_batched
    resb = solve_rc_batched(jnp.stack([T0, T0 * 1.02]), grid._consts,
                            planet.physics_params(), grid._kappa_fn,
                            SolverConfig(n_timesteps=2))
    fb = flux_balance(resb, grid._consts.trapz_w)
    assert fb.shape == (2,) and np.all(np.isfinite(fb))


@pytest.mark.slow   # three full solver compiles; the save/load
# mechanics stay fast-lane in test_checkpoint_roundtrip
def test_checkpoint_resume_is_exact(tmp_path):
    """Checkpointing after k iterations and resuming for the rest
    reproduces the continuous run EXACTLY (the checkpoint carries the
    pre-final-emit loop state)."""
    from frei_tpu.io.checkpoint import resume_state, save_solution
    from frei_tpu.rt.solver import SolverConfig, solve_rc_batched

    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=24, n_layers=6, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(opacities=load_example_opacity(
        grid, scale_factor=1.0, dtype=jnp.float64))
    rng = np.random.RandomState(4)
    T0 = jnp.asarray(np.asarray(grid.init_temperatures)[None, :]
                     * rng.uniform(0.95, 1.05, (3, 1)))
    # convergence disabled so the stopping rule (whose statistics
    # restart on resume) cannot differ
    def cfg(n):
        return SolverConfig(n_timesteps=n, n_zero_crossings=10 ** 6,
                            convergence_dT=0.0)
    args = (grid._consts, planet.physics_params(), grid._kappa_fn)
    full = solve_rc_batched(T0, *args, cfg(6))

    part = solve_rc_batched(T0, *args, cfg(3))
    save_solution(tmp_path / "ckpt.npz", part)
    temps_r, fluxes_r = resume_state(tmp_path / "ckpt.npz")
    resumed = solve_rc_batched(jnp.asarray(temps_r), *args, cfg(3),
                               init_fluxes=fluxes_r)
    np.testing.assert_array_equal(np.asarray(full.flux),
                                  np.asarray(resumed.flux))
    np.testing.assert_array_equal(np.asarray(full.final_temps),
                                  np.asarray(resumed.final_temps))
    np.testing.assert_array_equal(np.asarray(full.F_up),
                                  np.asarray(resumed.F_up))
