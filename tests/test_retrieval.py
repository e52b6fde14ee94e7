"""End-to-end retrieval acceptance: the differentiable solver must
actually CONVERGE an optimizer to known parameters, not merely produce
finite gradients (round-4 review demand).

``Grid.spectrum_fn`` + optax recover gravity, an initial-temperature
scale, and an irradiation scale (the ``T_star`` / ``a_rstar`` knob)
from a synthetic spectrum to ~1e-4 relative error.  The reference
cannot run this workflow at all: its driver is host Python around
per-layer C++ FastChem calls (`/root/reference/frei/core.py:233-338`).

Identifiability is MEASURED, not assumed: the mixing-length alpha's
spectral Jacobian is pinned at >=3 orders of magnitude below
gravity's — convection shapes the deep adiabat, not the emergent
photospheric spectrum of this configuration, so no optimizer can
recover alpha from this observable.  The test asserts that gap so the
docs' claim (docs/retrieval.md, "What a spectrum can and cannot
constrain") stays tied to a measurement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

optax = pytest.importorskip("optax")

from frei_tpu import Grid, Planet, load_example_opacity  # noqa: E402
from frei_tpu.rt.physics import PhysicsParams  # noqa: E402

W, L, NT = 32, 12, 4


@pytest.fixture(scope="module")
def setup():
    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=W, n_layers=L, T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(opacities=load_example_opacity(
        grid, scale_factor=1.0, dtype=jnp.float64))
    fn = grid.spectrum_fn(n_timesteps=NT, n_zero_crossings=10 ** 6,
                          convergence_dT=0.0)
    p0 = planet.physics_params()
    T_base = jnp.asarray(np.asarray(grid.init_temperatures))[None, :]
    F0 = grid._consts.F_toa[None, :]
    return planet, grid, fn, p0, T_base, F0


@pytest.mark.slow   # ~50 L-BFGS iterations through the remat solver
def test_lbfgs_recovers_g_T0scale_irradiation(setup):
    """Recover (g, T0-scale, F_toa-scale) in log-space from a
    synthetic observation, starting (+60%, +8%, -20%) off truth.
    Acceptance: every parameter within 1e-3 relative (measured
    recovery is ~1e-6; the margin covers BLAS/jax-version jitter)."""
    planet, grid, fn, p0, T_base, F0 = setup

    def model(theta):
        lg, ls, lf = theta
        par = PhysicsParams(g=jnp.exp(lg), m_bar=p0.m_bar,
                            alpha=p0.alpha, n_dof=p0.n_dof)
        return fn(T_base * jnp.exp(ls), par,
                  F_toa=F0 * jnp.exp(lf))[0]

    truth = jnp.log(jnp.asarray([float(p0.g), 1.0, 1.0]))
    observed = model(truth)

    def loss(theta):
        m = model(theta)
        return jnp.mean((m - observed) ** 2) / jnp.mean(observed ** 2)

    opt = optax.lbfgs()
    vg = optax.value_and_grad_from_state(loss)

    @jax.jit
    def step(theta, state):
        v, g = vg(theta, state=state)
        updates, state = opt.update(g, state, theta, value=v, grad=g,
                                    value_fn=loss)
        return optax.apply_updates(theta, updates), state, v

    theta = jnp.log(jnp.asarray([float(p0.g) * 1.6, 1.08, 0.8]))
    state = opt.init(theta)
    v = jnp.inf
    for i in range(120):
        theta, state, v = step(theta, state)
        if float(v) < 1e-18:
            break
    got = np.exp(np.asarray(theta))
    want = np.exp(np.asarray(truth))
    rel = np.abs(got - want) / want
    assert float(v) < 1e-12, f"loss did not converge: {float(v)}"
    assert np.all(rel < 1e-3), (
        f"recovered {got} vs true {want} (rel err {rel})")


@pytest.mark.slow   # jacobian through the remat solver (~15 s CPU)
def test_mixing_length_alpha_is_not_identifiable(setup):
    """Pinned negative result: d(spectrum)/d(log alpha) is tiny.

    The Jacobian column norm for log-alpha must stay >=3 orders below
    log-g's — the quantitative fact behind restricting the acceptance
    test to (g, T0-scale, irradiation).  If a future config makes
    alpha identifiable, this pin flags it and the acceptance test
    should grow a fourth parameter."""
    planet, grid, fn, p0, T_base, F0 = setup

    def model(theta):
        lg, la, ls = theta
        par = PhysicsParams(g=jnp.exp(lg), m_bar=p0.m_bar,
                            alpha=jnp.exp(la), n_dof=p0.n_dof)
        return fn(T_base * jnp.exp(ls), par)[0]

    truth = jnp.log(jnp.asarray([float(p0.g), float(p0.alpha), 1.0]))
    obs = model(truth)
    scale = jnp.mean(obs ** 2) ** 0.5
    J = np.asarray(jax.jacobian(
        lambda th: (model(th) - obs) / scale)(truth))
    norms = np.linalg.norm(J, axis=0)      # (g, alpha, s)
    assert np.all(np.isfinite(J))
    assert norms[0] > 1.0                  # gravity is identifiable
    assert norms[2] > 1.0                  # T0-scale is identifiable
    assert norms[1] < 1e-3 * norms[0], (
        f"alpha sensitivity {norms[1]:.3g} vs g {norms[0]:.3g} — "
        "alpha became identifiable; extend the acceptance test")
