"""Fused Pallas sweep/kappa kernels vs the XLA reference path.

Kernels run through the Pallas interpreter on CPU (the compiled TPU
path is exercised by bench.py / the verify recipe on real hardware).
Engines agree up to float summation order; in float64 interpret mode
that is ~1e-10, asserted tightly here.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frei_tpu import Grid, Planet, load_example_opacity
from frei_tpu.ops.kappa_pallas import kappa_pallas
from frei_tpu.ops.sweep_pallas import (absorb_sweep_pallas,
                                       emit_sweep_pallas,
                                       make_sweep_consts)
from frei_tpu.ops.twostream import expm1_series
from frei_tpu.opacity.tables import (kappa_from_layer_tables,
                                     kappa_from_stack, make_layer_tables)
from frei_tpu.rt.physics import PhysicsParams
from frei_tpu.rt.solver import SolverConfig, solve_rc, solve_rc_batched
from frei_tpu.rt.sweeps import absorb_sweep, emit_sweep

B, L, W = 3, 7, 24


@pytest.fixture(scope="module")
def setup():
    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=W, n_layers=L, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(opacities=load_example_opacity(
        grid, scale_factor=1.0, dtype=jnp.float64))
    params0 = planet.physics_params()
    params = PhysicsParams(
        g=jnp.float64(params0.g), m_bar=jnp.float64(params0.m_bar),
        alpha=jnp.float64(params0.alpha), n_dof=params0.n_dof)
    rng = np.random.RandomState(0)
    T = jnp.asarray(np.asarray(grid.init_temperatures)[None, :]
                    * rng.uniform(0.9, 1.1, (B, 1)))
    Fu = jnp.asarray(rng.rand(B, L, W) * 1e10)
    Fd = jnp.asarray(rng.rand(B, L, W) * 1e10)
    K = jax.vmap(lambda t: grid._kappa_fn(
        t, grid._consts.pressures))(T)
    return planet, grid, params, T, Fu, Fd, K


def test_expm1_series_accuracy():
    x = jnp.asarray(np.concatenate([
        np.linspace(-30.0, -0.5, 41), np.linspace(-0.5, 0.5, 101),
        np.linspace(0.5, 30.0, 41)]))
    np.testing.assert_allclose(np.asarray(expm1_series(x)),
                               np.expm1(np.asarray(x)),
                               rtol=5e-9, atol=1e-300)


@pytest.mark.parametrize("direction", ["emit", "absorb"])
def test_sweep_kernel_matches_xla(setup, direction):
    planet, grid, params, T, Fu, Fd, K = setup
    consts = grid._consts
    sc = make_sweep_consts(consts, params)
    kw = dict(sigma_scat=consts.sigma_scat, F_toa=consts.F_toa,
              lam_cm=consts.lam_cm, trapz_w=consts.trapz_w,
              pressures=consts.pressures, params=params)
    xla = emit_sweep if direction == "emit" else absorb_sweep
    pal = emit_sweep_pallas if direction == "emit" else absorb_sweep_pallas
    ref = jax.vmap(lambda t, fu, fd, k: xla(t, fu, fd, k, **kw))(
        T, Fu, Fd, K)
    # block_columns=2 with odd B also exercises the padding path
    out = pal(T, Fu, Fd, K, sc, consts.pressures, params,
              block_columns=2, interpret=True)
    # rtol 1e-7 (not 1e-9): the kernel hoists the Planck argument
    # (xrow * 1/T vs hc/(lam T)) and uses the g0-specialized coupler
    # form — equal in real arithmetic (test_twostream), ~ulp-level
    # reordering in float64, slightly amplified through the adaptive
    # timestep in dT
    for name, a, b in zip(["F_up", "F_down", "temps", "dT"],
                          [ref.F_up, ref.F_down, ref.temps, ref.dT], out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7,
            atol=1e-9 * float(np.abs(np.asarray(a)).max()),
            err_msg=f"{direction} {name}")


def test_batched_solver_xla_engine_equals_vmap(setup):
    planet, grid, params, T, *_ = setup
    consts = grid._consts
    cfg = SolverConfig(n_timesteps=6)
    ref = jax.vmap(partial(solve_rc, consts=consts,
                           params=planet.physics_params(),
                           kappa_all=grid._kappa_fn, cfg=cfg))(T)
    bat = solve_rc_batched(T, consts, planet.physics_params(),
                           grid._kappa_fn,
                           SolverConfig(n_timesteps=6, engine="xla"))
    for f in ["flux", "final_temps", "temp_history", "dtaus", "F_up",
              "F_down", "max_dT_history"]:
        np.testing.assert_allclose(
            np.asarray(getattr(ref, f)), np.asarray(getattr(bat, f)),
            rtol=1e-12, err_msg=f)
    for f in ["n_iterations", "n_history", "converged"]:
        np.testing.assert_array_equal(np.asarray(getattr(ref, f)),
                                      np.asarray(getattr(bat, f)))


@pytest.mark.parametrize(
    "engine",
    [# all interpret-mode whole-trajectory parametrizations are slow
     # lane (round-5 fast-lane budget): fast-lane Pallas coverage is
     # the per-sweep kernel parity (test_sweep_kernel_matches_xla)
     # plus the converged-solve parity
     # (test_grid_emission_spectra_matches_per_column)
     pytest.param("pallas-interpret", marks=pytest.mark.slow),
     pytest.param("pallas-iteration-interpret", marks=pytest.mark.slow),
     pytest.param("pallas-loop-interpret", marks=pytest.mark.slow)])
def test_batched_solver_pallas_engine_trajectory(engine):
    # standalone smaller grid: interpret-mode trace cost scales with
    # the unrolled layer count, and this test only needs trajectories
    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=16, n_layers=5, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(opacities=load_example_opacity(
        grid, scale_factor=1.0, dtype=jnp.float64))
    rng = np.random.RandomState(0)
    T = jnp.asarray(np.asarray(grid.init_temperatures)[None, :]
                    * rng.uniform(0.9, 1.1, (3, 1)))
    consts = grid._consts
    xla = solve_rc_batched(T, consts, planet.physics_params(),
                           grid._kappa_fn,
                           SolverConfig(n_timesteps=2, engine="xla"))
    pal = solve_rc_batched(
        T, consts, planet.physics_params(), grid._kappa_fn,
        SolverConfig(n_timesteps=2, engine=engine))
    np.testing.assert_allclose(np.asarray(xla.flux), np.asarray(pal.flux),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(xla.final_temps),
                               np.asarray(pal.final_temps), rtol=1e-8)
    np.testing.assert_array_equal(np.asarray(xla.n_iterations),
                                  np.asarray(pal.n_iterations))


def test_size1_per_column_params_rejected_lengths():
    """Wrong per-column lengths must fail loudly on every engine (no
    solve happens — the normalization raises before tracing)."""
    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=8, n_layers=4, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(opacities=load_example_opacity(
        grid, scale_factor=1.0, dtype=jnp.float64))
    T = jnp.asarray(np.asarray(grid.init_temperatures)[None, :]
                    .repeat(2, 0))
    p0 = planet.physics_params()
    bad = PhysicsParams(g=jnp.full(3, p0.g), m_bar=p0.m_bar,
                        alpha=p0.alpha, n_dof=p0.n_dof)
    for engine in ["xla", "pallas-interpret"]:
        with pytest.raises(ValueError, match="per-column params.g"):
            solve_rc_batched(T, grid._consts, bad, grid._kappa_fn,
                             SolverConfig(engine=engine, n_timesteps=1))


@pytest.mark.slow   # three distinct solver traces incl. a
# per-column pallas-interpret program; the loud-rejection half of the
# regression (below-threshold cost) stays in the fast lane
def test_size1_per_column_params_engine_agnostic():
    """Size-1 per-column arrays (a (1,) g, a (1, W) F_toa) with B > 1
    columns must mean the same thing on every engine: broadcast to all
    columns.  They used to be broadcast only on the xla path, while
    the pallas path handed make_sweep_consts an unbroadcast (1, 1)
    inv_g that mismatched its (bc, 1) BlockSpec grid (advisor
    finding, round 3)."""
    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=16, n_layers=5, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(opacities=load_example_opacity(
        grid, scale_factor=1.0, dtype=jnp.float64))
    rng = np.random.RandomState(0)
    T = jnp.asarray(np.asarray(grid.init_temperatures)[None, :]
                    * rng.uniform(0.9, 1.1, (3, 1)))
    consts = grid._consts
    p0 = planet.physics_params()
    par1 = PhysicsParams(g=jnp.asarray([p0.g]), m_bar=p0.m_bar,
                         alpha=jnp.asarray([p0.alpha]), n_dof=p0.n_dof)
    consts1 = consts._replace(F_toa=consts.F_toa[None, :])
    cfg = dict(n_timesteps=2)
    xla = solve_rc_batched(T, consts1, par1, grid._kappa_fn,
                           SolverConfig(engine="xla", **cfg))
    pal = solve_rc_batched(T, consts1, par1, grid._kappa_fn,
                           SolverConfig(engine="pallas-interpret", **cfg))
    # shared-scalar reference: identical physics, non-population path
    ref = solve_rc_batched(T, consts, p0, grid._kappa_fn,
                           SolverConfig(engine="xla", **cfg))
    np.testing.assert_allclose(np.asarray(ref.flux), np.asarray(xla.flux),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(xla.flux), np.asarray(pal.flux),
                               rtol=1e-7)


@pytest.mark.slow   # two fresh interpret-mode traces + clear_caches
def test_planck_table_mode_bounded_error(setup):
    """Experimental in-kernel Planck-by-table evaluation (round-4
    bounded experiment): single-step flux agrees with the direct
    expm1 path within the table's measured interpolation error
    (linear-in-logT, ~1.8e-6 of peak at n=4096 — NOT the 3e-7 parity
    grade; the mode is experiment-only and warns on selection)."""
    import frei_tpu.ops.sweep_pallas as sp

    planet, grid, params, T, *_ = setup
    consts = grid._consts
    cfg = SolverConfig(n_timesteps=1, engine="pallas-interpret")
    ref = solve_rc_batched(T, consts, planet.physics_params(),
                           grid._kappa_fn, cfg)
    jax.clear_caches()     # the mode is trace-time module state
    with pytest.warns(UserWarning, match="planck"):
        sp.set_planck_mode("table", 4096)
    try:
        tab = solve_rc_batched(T, consts, planet.physics_params(),
                               grid._kappa_fn, cfg)
    finally:
        sp.set_planck_mode("direct")
        jax.clear_caches()
    pk = float(np.abs(np.asarray(ref.flux)).max())
    diff = float(np.abs(np.asarray(ref.flux)
                        - np.asarray(tab.flux)).max()) / pk
    assert 0 < diff < 5e-6   # 0 would mean the mode never engaged


@pytest.mark.slow   # fresh interpret-mode traces per configuration
@pytest.mark.parametrize("layout,mode", [
    ("layer", "batched"), ("batch", "padk32"), ("batch", "tabT")])
def test_staging_experiment_modes_exact(setup, layout, mode):
    """The round-5 staging-experiment lowerings (committed negative
    results, docs/design-notes.md) must stay numerically exact vs the
    production path: layer-major weight generation and padk32 are
    bit-identical; tabT reorders the K-sum (float-order only)."""
    import warnings

    import frei_tpu.ops.sweep_pallas as sp

    planet, grid, params, T, *_ = setup
    cfg = SolverConfig(n_timesteps=2, engine="pallas-interpret")
    ref = solve_rc_batched(T, grid._consts, planet.physics_params(),
                           grid._kappa_fn, cfg)
    jax.clear_caches()     # modes are trace-time module state
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sp.set_ohs_layout(layout)
        sp.set_kappa_dot_mode(mode)
    try:
        got = solve_rc_batched(T, grid._consts,
                               planet.physics_params(),
                               grid._kappa_fn, cfg)
    finally:
        sp.set_ohs_layout("batch")
        sp.set_kappa_dot_mode("batched")
        jax.clear_caches()
    if mode == "tabT":
        np.testing.assert_allclose(np.asarray(got.flux),
                                   np.asarray(ref.flux), rtol=1e-10)
    else:
        np.testing.assert_array_equal(np.asarray(got.flux),
                                      np.asarray(ref.flux))
    np.testing.assert_allclose(np.asarray(got.final_temps),
                               np.asarray(ref.final_temps), rtol=1e-12)


def test_layer_tables_match_bilinear(setup):
    """P-interp hoisting reproduces the 4-corner bilinear kappa,
    including out-of-hull zeros."""
    planet, grid, params, T, *_ = setup
    stack = grid.opacities
    consts = grid._consts
    chem = grid.chemistry
    lt = make_layer_tables(stack, consts.pressures)
    # push some temperatures outside the tabulated range
    T2 = T.at[:, 0].set(50.0).at[:, -1].set(99000.0)
    mmr = chem.mmr(T2, consts.pressures)
    a, _ = kappa_from_stack(stack, mmr, T2, consts.pressures,
                            consts.sigma_scat)
    b, _ = kappa_from_layer_tables(lt, mmr, T2, consts.sigma_scat)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


def test_kappa_pallas_kernel_interpret(setup):
    planet, grid, params, T, *_ = setup
    stack = grid.opacities
    consts = grid._consts
    mmr = grid.chemistry.mmr(T, consts.pressures)
    a, _ = kappa_from_stack(stack, mmr, T, consts.pressures,
                            consts.sigma_scat)
    b, _ = kappa_pallas(stack, mmr, T, consts.pressures,
                        consts.sigma_scat, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


def test_grid_emission_spectra_matches_per_column(setup):
    """The Grid-level batched API reproduces per-column solve_rc."""
    planet, grid, params, T, *_ = setup
    spec, temps, hist, dtaus = grid.emission_spectra(
        T, n_timesteps=4, engine="xla")
    assert spec.flux_cgs.shape == (B, W)
    assert temps.shape == (B, L)
    assert dtaus.shape == (B, L, W)
    cfg = SolverConfig(n_timesteps=4)
    for c in [0, B - 1]:
        one = solve_rc(T[c], grid._consts, planet.physics_params(),
                       grid._kappa_fn, cfg)
        # batched vs single-column compilations reduce the bolometric
        # quadrature in different orders -> ~1e-10 relative
        np.testing.assert_allclose(spec.flux_cgs[c], np.asarray(one.flux),
                                   rtol=1e-9)
        np.testing.assert_allclose(temps[c], np.asarray(one.final_temps),
                                   rtol=1e-9)
    assert grid.last_metrics.columns == B


@pytest.mark.slow
def test_equilibrium_chemistry_with_pallas_engine():
    """FastChem-equivalent chemistry composes with the fused engine:
    xla and pallas-interpret trajectories agree, and kappa varies
    across layers (live chemistry, not the constant mock)."""
    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=32, n_layers=8, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(
        opacities=load_example_opacity(grid, scale_factor=1.0,
                                       dtype=jnp.float64),
        chemistry="equilibrium")
    rng = np.random.RandomState(1)
    T0 = jnp.asarray(np.asarray(grid.init_temperatures)[None, :]
                     * rng.uniform(0.95, 1.05, (3, 1)))
    rx = solve_rc_batched(T0, grid._consts, planet.physics_params(),
                          grid._kappa_fn,
                          SolverConfig(n_timesteps=3, engine="xla"))
    rp = solve_rc_batched(
        T0, grid._consts, planet.physics_params(), grid._kappa_fn,
        SolverConfig(n_timesteps=3, engine="pallas-interpret"))
    np.testing.assert_allclose(np.asarray(rx.flux), np.asarray(rp.flux),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(rx.final_temps),
                               np.asarray(rp.final_temps), rtol=1e-8)
    k = grid._kappa_fn(T0, grid._consts.pressures)
    col = np.asarray(k)[0, :, 16]
    assert np.ptp(col / col.mean()) > 1e-3  # T-dependent abundances


@pytest.mark.slow
def test_multispecies_pipeline_with_fused_kernels(tmp_path):
    """Full multi-species path: three synthetic stores -> resort-rebin
    -> stacked tables -> equilibrium chemistry -> batched solve with
    the fused Pallas kernels (S > 1 exercises the K = S*nT weight-row
    contraction) vs the XLA engine."""
    from frei_tpu.opacity import binned_opacity_stack, make_synthetic_store

    for iso, seed in [("1H2-16O", 7), ("23Na", 8), ("48Ti-16O", 9)]:
        make_synthetic_store(tmp_path / f"{iso}__syn.ftop",
                             isotopologue=iso, n_hr=40_000, seed=seed)
    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=40, n_layers=8, T_ref=2400.0,
                dtype=jnp.float64)
    stack = binned_opacity_stack(grid.rt_grid,
                                 path=str(tmp_path / "*.ftop"),
                                 cache=False, dtype=jnp.float64)
    assert stack.values.shape[0] == 3
    grid.load_opacities(opacities=stack, chemistry="equilibrium")

    rng = np.random.RandomState(2)
    T0 = jnp.asarray(np.asarray(grid.init_temperatures)[None, :]
                     * rng.uniform(0.95, 1.05, (4, 1)))
    rx = solve_rc_batched(T0, grid._consts, planet.physics_params(),
                          grid._kappa_fn,
                          SolverConfig(n_timesteps=3, engine="xla"))
    # the two-kernel engine matches xla at ~1e-10 (identical chem.mmr
    # values); the iteration engine recomputes chemistry in-kernel by
    # interpolating the float32 ln-MMR tables at full precision, so
    # its mixing ratios differ from FastChemJAX._vmr_from_table's
    # float32 bilinear at float32 roundoff (~1e-7 relative kappa),
    # hence the looser flux tolerance
    for engine in ("pallas-interpret", "pallas-iteration-interpret",
                   "pallas-loop-interpret"):
        rp = solve_rc_batched(T0, grid._consts, planet.physics_params(),
                              grid._kappa_fn,
                              SolverConfig(n_timesteps=3, engine=engine))
        np.testing.assert_allclose(np.asarray(rx.flux),
                                   np.asarray(rp.flux), rtol=1e-4,
                                   err_msg=engine)
        np.testing.assert_allclose(np.asarray(rx.final_temps),
                                   np.asarray(rp.final_temps),
                                   rtol=1e-5, err_msg=engine)
    assert np.all(np.isfinite(np.asarray(rx.flux)))


@pytest.mark.slow
def test_loop_engine_resume_and_early_convergence():
    """pallas-loop engine edge semantics: warm-start via init_fluxes
    continues the trajectory exactly (checkpoint/resume contract), and
    early-converged columns freeze identically to the xla engine.

    Uses a private small grid (not the module fixture): the test runs
    five whole-loop interpret-mode solves, which dominate the fast
    lane at the fixture size."""
    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=16, n_layers=6, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(opacities=load_example_opacity(
        grid, scale_factor=1.0, dtype=jnp.float64))
    rng = np.random.RandomState(0)
    T = jnp.asarray(np.asarray(grid.init_temperatures)[None, :]
                    * rng.uniform(0.9, 1.1, (3, 1)))
    consts = grid._consts

    def cfg(n, engine):
        return SolverConfig(n_timesteps=n, n_zero_crossings=10 ** 6,
                            convergence_dT=0.0, engine=engine)
    args = (consts, planet.physics_params(), grid._kappa_fn)
    full = solve_rc_batched(T, *args, cfg(2, "pallas-loop-interpret"))
    part = solve_rc_batched(T, *args, cfg(1, "pallas-loop-interpret"))
    resumed = solve_rc_batched(
        part.loop_temps, *args, cfg(1, "pallas-loop-interpret"),
        init_fluxes=(part.loop_F_up, part.loop_F_down))
    np.testing.assert_array_equal(np.asarray(full.flux),
                                  np.asarray(resumed.flux))
    np.testing.assert_array_equal(np.asarray(full.final_temps),
                                  np.asarray(resumed.final_temps))

    # convergence path: loose threshold converges everything quickly —
    # frozen-column counters must match the xla engine exactly
    loose = SolverConfig(n_timesteps=4, n_zero_crossings=2,
                         convergence_dT=50.0, engine="xla")
    rx = solve_rc_batched(T, *args, loose)
    rl = solve_rc_batched(
        T, *args, loose._replace(engine="pallas-loop-interpret"))
    np.testing.assert_array_equal(np.asarray(rx.n_iterations),
                                  np.asarray(rl.n_iterations))
    np.testing.assert_array_equal(np.asarray(rx.converged),
                                  np.asarray(rl.converged))
    np.testing.assert_allclose(np.asarray(rx.final_temps),
                               np.asarray(rl.final_temps), rtol=1e-8)
