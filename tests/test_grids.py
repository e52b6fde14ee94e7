import numpy as np
import pytest

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


def test_astropy_quantity_boundary():
    """Constructors accept astropy Quantities and convert them to the
    same canonical CGS as documented plain floats (the reference
    carries Quantities everywhere, `core.py:68-70,113-116`; frei_tpu
    validates once at the boundary)."""
    u = pytest.importorskip("astropy.units")

    from frei_tpu import Grid, Planet

    p_plain = Planet(a_rstar=6.45, m_bar=2.4, g=24.79, T_star=5800.0)
    p_q = Planet(a_rstar=6.45, m_bar=2.4 * 1.67262192369e-24 * u.g,
                 g=2479.0 * u.cm / u.s ** 2, T_star=5800.0 * u.K)
    assert abs(p_plain.m_bar - p_q.m_bar) / p_plain.m_bar < 1e-9
    assert abs(p_plain.g - p_q.g) / p_plain.g < 1e-12
    assert p_plain.T_star == p_q.T_star

    g_plain = Grid(p_plain, lam_min=0.6, lam_max=9.0, n_wl_bins=40,
                   P_toa=1e-5, P_boa=100.0, n_layers=8, T_ref=2400.0)
    g_q = Grid(p_q, lam_min=0.6 * u.um, lam_max=9000.0 * u.nm,
               n_wl_bins=40, P_toa=1e-5 * u.bar, P_boa=10.0 * u.MPa,
               n_layers=8, T_ref=2400.0 * u.K)
    np.testing.assert_allclose(np.asarray(g_plain.lam),
                               np.asarray(g_q.lam), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_plain.pressures),
                               np.asarray(g_q.pressures), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_plain.init_temperatures),
                               np.asarray(g_q.init_temperatures),
                               rtol=1e-12)


def test_quantity_round_trip_outputs():
    """Quantity in -> Quantity out (VERDICT parity item: the reference
    returns a Spectrum1D + Quantity temps, `core.py:335-338`).  With
    astropy installed the Spectrum properties carry units; the raw
    ``*_um`` / ``*_cgs`` fields stay bare for numerics."""
    u = pytest.importorskip("astropy.units")
    from frei_tpu import Grid, Planet, load_example_opacity

    planet = Planet.from_hot_jupiter()
    grid = Grid(planet, n_wl_bins=24, n_layers=4,
                T_ref=2400.0 * u.K, lam_min=0.5 * u.um,
                lam_max=10.0 * u.um)
    grid.load_opacities(opacities=load_example_opacity(grid))
    spec, *_ = grid.emission_spectrum(n_timesteps=1)
    assert spec.flux.unit == u.erg / u.s / u.cm ** 3
    assert spec.spectral_axis.unit == u.um
    assert spec.wavelength.unit == u.um
    # downstream reference-style .to() conversions port unchanged
    np.testing.assert_allclose(
        spec.flux.to_value(u.W / u.m ** 3),
        np.asarray(spec.flux_cgs) * 1e-7 * 1e6)
    np.testing.assert_allclose(spec.wavelength.to_value(u.cm),
                               spec.wavelength_um * 1e-4)


def test_spectrum_units_fallback_without_astropy(monkeypatch):
    """Without astropy the unit-carrying properties degrade to the bare
    canonical-unit arrays (no hard dependency)."""
    import builtins

    from frei_tpu.api import Spectrum

    real_import = builtins.__import__

    def no_astropy(name, *a, **k):
        if name.startswith("astropy"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_astropy)
    spec = Spectrum(wavelength_um=np.array([1.0, 2.0]),
                    flux_cgs=np.array([3.0, 4.0]))
    assert spec.flux is spec.flux_cgs
    assert spec.spectral_axis is spec.wavelength_um
    assert spec.wavelength is spec.wavelength_um


def test_user_grids_validated():
    """Descending wavelengths (wavenumber-ordered input) and ascending
    (TOA-first) pressures must fail at construction — both previously
    produced silently unphysical grids (round-4 review)."""
    import pytest

    from frei_tpu.grids import make_rt_grid, wavelength_grid
    with pytest.raises(ValueError, match="ascending"):
        wavelength_grid(lam=np.linspace(10.0, 0.5, 50))
    with pytest.raises(ValueError, match="1-D"):
        wavelength_grid(lam=np.array([1.0]))
    with pytest.raises(ValueError, match="descending"):
        make_rt_grid(pressures_bar=np.logspace(-6, 1.1, 10))  # TOA first
