#!/usr/bin/env python
"""Adjudication script for the synthetic-fixture calibration.

The reference's synthetic opacity fixture carries a hard-coded
prefactor of 5 on the opacity profile
(`/root/reference/frei/opacity.py:326`:
``simple_opacities[:] += 5 * 10**(2.5 * (so.value - 0.4))``), while its
published golden test runs the fixture at ``scale_factor=1``
(`/root/reference/frei/tests/test_core.py:28`) and asserts
peak wavelength 1.1518 um +- 0.02, peak flux 1.296e13 +- 0.1e13
erg/s/cm^3, and T_eff ~ T_ref = 2400 K +- 200
(`test_core.py:52-71`).  Those two facts are mutually inconsistent:
with the x5 prefactor the golden assertions fail badly; without it
they pass.  frei_tpu's fixture therefore omits the prefactor
(`frei_tpu/opacity/tables.py:load_example_opacity`), so that

    frei_tpu  load_example_opacity(grid, scale_factor=s)
    reference load_example_opacity(grid, scale_factor=s/5)   (same cube)

Run this script to reproduce both calibrations end-to-end and print
the measured numbers next to the published goldens.  The equivalence
``scale_factor=5`` == reference-source-at-its-test's-scale is pinned in
``tests/test_golden.py::test_reference_source_scale_factor_five``.

Run: PYTHONPATH=. python tools/fixture_calibration.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDENS = {"peak_wl_um": (1.1518, 0.02),
           "peak_flux": (1.296e13, 0.1e13),
           "T_eff_K": (2400.0, 200.0)}


def run_calibration(scale_factor: float):
    """One-timestep golden-configuration solve at the given frei_tpu
    fixture scale (float64, 500 bins x 30 layers)."""
    import jax.numpy as jnp
    import numpy as np

    from frei_tpu import (Grid, Planet, effective_temperature,
                          load_example_opacity)

    grid = Grid(Planet.from_hot_jupiter(), T_ref=2400.0,
                dtype=jnp.float64)
    grid.load_opacities(opacities=load_example_opacity(
        grid, scale_factor=scale_factor, dtype=jnp.float64))
    spec, temps, _, dtaus = grid.emission_spectrum(n_timesteps=1)
    return {
        "peak_wl_um": float(spec.wavelength_um[np.argmax(spec.flux_cgs)]),
        "peak_flux": float(np.max(spec.flux_cgs)),
        "T_eff_K": float(effective_temperature(grid, spec, dtaus,
                                               temps)),
    }


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    cases = [
        ("published goldens (frei_tpu fixture, scale_factor=1)", 1.0),
        ("reference source x5 (frei_tpu scale_factor=5)", 5.0),
    ]
    for label, sf in cases:
        got = run_calibration(sf)
        print(f"\n{label}:")
        for key, (target, atol) in GOLDENS.items():
            v = got[key]
            ok = abs(v - target) < atol
            print(f"  {key:12s} = {v:12.5g}   golden {target:.5g} "
                  f"+- {atol:.3g}   {'PASS' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
