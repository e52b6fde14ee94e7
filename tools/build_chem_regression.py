#!/usr/bin/env python
"""Regenerate the committed chemistry golden-profile regression table.

Solves equilibrium with the float64 exact Gauss-Seidel solver at high
sweep count over the reference chemistry-test T-P profile
(`/root/reference/frei/tests/test_chemistry.py:12-13`: P = logspace(-6,
2, 100) bar, T = 2400 (P / 0.1 bar)^0.1 K) and stores point-wise
log10 VMR profiles for a representative species set.  The stored table
is the regression target of
``tests/test_fastchem.py::test_golden_vmr_profiles`` (rtol 1e-3
point-wise) — any change to the solver, the logK fits, or the
abundances that moves equilibrium VMRs shows up as a diff here.

Run: PYTHONPATH=. python tools/build_chem_regression.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).resolve().parent.parent / "tests" / "data" / \
    "chem_profile_golden.npz"

# 14 species spanning majors, trace metals, and ions' neutral partners
SPECIES_HILL = ["H2", "H", "H2O1", "C1O1", "C1H4", "H3N1", "Na", "K",
                "O1Ti1", "O1V1", "H1O1", "C1O2", "H2S1", "Fe"]

P_BAR = np.logspace(-6, 2, 100)
T_K = 2400.0 * (P_BAR / 0.1) ** 0.1


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from frei_tpu.chemistry.fastchem import (equilibrium_log_pressures,
                                             load_chem_table)

    table = load_chem_table()
    ln_p, _, r = equilibrium_log_pressures(
        table, jnp.asarray(T_K), jnp.asarray(P_BAR), n_sweeps=120,
        return_residuals=True)
    print(f"final pressure-closure residual: {float(r[-1]):.3e}")
    assert float(r[-1]) < 1e-10, "regenerated table must be converged"
    idx = [table.species_index(h) for h in SPECIES_HILL]
    assert all(i >= 0 for i in idx), "species missing from chem tables"
    log10_vmr = (np.asarray(ln_p)[:, idx]
                 - np.log(P_BAR)[:, None]) / np.log(10.0)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        OUT, species=np.array(SPECIES_HILL), P_bar=P_BAR, T_K=T_K,
        log10_vmr=log10_vmr)
    print(f"wrote {OUT}: {log10_vmr.shape} log10-VMR table, "
          f"range [{log10_vmr.min():.1f}, {log10_vmr.max():.1f}]")


if __name__ == "__main__":
    main()
