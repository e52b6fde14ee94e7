import numpy as np

from frei_tpu.grids import (make_rt_grid, pressure_grid, temperature_grid,
                            trapezoid_weights, wavelength_grid)


def test_wavelength_grid_basic():
    lam, edges, R = wavelength_grid(0.5, 10.0, 500)
    assert lam.shape == (500,)
    assert edges.shape == (501,)
    assert np.isclose(lam[0], 0.5) and np.isclose(lam[-1], 10.0)
    # log-spaced
    ratios = lam[1:] / lam[:-1]
    assert np.allclose(ratios, ratios[0])
    # R ~ 500ish at the midpoint for the default grid
    mid = 250
    assert np.isclose(R, lam[mid] / (lam[mid + 1] - lam[mid]))
    # edge construction identity (reference core.py:40-43)
    dlam = lam[1] - lam[0]
    assert np.isclose(edges[0], lam[0] - dlam / 2)
    assert np.allclose(edges[1:], lam + dlam / 2)


def test_pressure_grid_boa_first():
    p = pressure_grid(30, -6.0, np.log10(200.0))
    assert p.shape == (30,)
    assert p[0] > p[-1]            # BOA (high pressure) first
    assert np.isclose(p[0], 200.0)
    assert np.isclose(p[-1], 1e-6)


def test_temperature_grid_power_law():
    p = pressure_grid(30, -6.0, np.log10(200.0))
    T = temperature_grid(p, T_ref=2400.0, P_ref=0.1, alpha=0.1)
    assert np.isclose(T[0], 2400.0 * (200.0 / 0.1) ** 0.1)
    # monotonic with pressure
    assert np.all(np.diff(T) < 0)


def test_trapezoid_weights_match_np_trapz():
    x = np.logspace(0, 1, 37)
    f = np.sin(x) ** 2 + 2.0
    assert np.isclose(f @ trapezoid_weights(x), np.trapezoid(f, x),
                      rtol=1e-14)


def test_make_rt_grid_cgs():
    g = make_rt_grid(n_wl_bins=100, n_layers=10)
    assert g.n_layers == 10 and g.n_wavelengths == 100
    assert np.isclose(g.lam_cm[0], 0.5e-4)
    assert np.isclose(g.pressures_cgs[0], 200e6)
    assert np.isclose(g.pressures_bar[-1], 1e-6)
