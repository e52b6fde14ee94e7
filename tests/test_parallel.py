"""Sharded ensemble solves on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frei_tpu import Grid, Planet, load_example_opacity
from frei_tpu.parallel import make_mesh, solve_ensemble
from frei_tpu.rt.solver import SolverConfig


@pytest.fixture(scope="module")
def setup():
    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=64, n_layers=10, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(
        opacities=load_example_opacity(grid, scale_factor=1.0,
                                       dtype=jnp.float64))
    return planet, grid


def _ensemble_inputs(grid, n_cols):
    rng = np.random.RandomState(11)
    base = np.asarray(grid.rt_grid.init_temperatures)
    return base[None, :] * rng.uniform(0.9, 1.1, (n_cols, 1))


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    m = make_mesh()
    assert m.shape == {"columns": 8, "bins": 1}
    m2 = make_mesh(n_columns=4, n_bins=2)
    assert m2.shape == {"columns": 4, "bins": 2}
    with pytest.raises(ValueError):
        make_mesh(n_columns=3, n_bins=2)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_ensemble_matches_per_column(setup, mesh_shape):
    """Sharded batch solve == independent single-column solves, for
    every mesh factorization (columns-only and bins-sharded)."""
    planet, grid = setup
    T0 = _ensemble_inputs(grid, 16)
    cfg = SolverConfig(n_timesteps=3)
    mesh = make_mesh(*mesh_shape)
    res = solve_ensemble(jnp.asarray(T0), grid._consts,
                         planet.physics_params(), grid.opacities,
                         grid.chemistry, cfg, mesh=mesh)
    assert res.flux.shape == (16, 64)
    # single-column references through the unsharded path
    from frei_tpu.rt.solver import solve_rc
    for c in [0, 7, 15]:
        one = solve_rc(jnp.asarray(T0[c]), grid._consts,
                       planet.physics_params(), grid._kappa_fn, cfg)
        np.testing.assert_allclose(res.flux[c], one.flux, rtol=1e-10)
        np.testing.assert_allclose(res.final_temps[c], one.final_temps,
                                   rtol=1e-10)


def test_early_convergence_freezing(setup):
    """A column that converges early must be bitwise-stable while other
    columns keep iterating (per-column trajectory independence)."""
    planet, grid = setup
    base = np.asarray(grid.rt_grid.init_temperatures)
    # one ordinary column + one with a huge convergence margin via
    # many timesteps: compare against its single-column trajectory
    T0 = np.stack([base, base * 1.08])
    cfg = SolverConfig(n_timesteps=30)
    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    res = solve_ensemble(jnp.asarray(T0), grid._consts,
                         planet.physics_params(), grid.opacities,
                         grid.chemistry, cfg, mesh=mesh)
    from frei_tpu.rt.solver import solve_rc
    for c in range(2):
        one = solve_rc(jnp.asarray(T0[c]), grid._consts,
                       planet.physics_params(), grid._kappa_fn, cfg)
        np.testing.assert_allclose(res.final_temps[c], one.final_temps,
                                   rtol=1e-10)
        assert int(res.n_iterations[c]) == int(one.n_iterations)


def test_ensemble_pallas_shard_map(setup):
    """Columns-only meshes run the fused Pallas engine per shard under
    shard_map; results match the per-column XLA solves."""
    planet, grid = setup
    T0 = _ensemble_inputs(grid, 16)
    mesh = make_mesh(8, 1)
    cfg = SolverConfig(n_timesteps=3, engine="pallas-interpret")
    res = solve_ensemble(jnp.asarray(T0), grid._consts,
                         planet.physics_params(), grid.opacities,
                         grid.chemistry, cfg, mesh=mesh)
    assert res.flux.shape == (16, 64)
    from frei_tpu.rt.solver import solve_rc
    for c in [0, 5, 15]:
        one = solve_rc(jnp.asarray(T0[c]), grid._consts,
                       planet.physics_params(), grid._kappa_fn,
                       SolverConfig(n_timesteps=3))
        np.testing.assert_allclose(res.flux[c], one.flux, rtol=1e-7)
        np.testing.assert_allclose(res.final_temps[c], one.final_temps,
                                   rtol=1e-8)
