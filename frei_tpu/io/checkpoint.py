"""Solver-state checkpoint / resume.

The reference only persists caches (downloaded opacities, PHOENIX
spectra); iteration state is returned but never saved
(`SURVEY.md` section 5).  For long radiative-convective runs and
large ensembles, frei_tpu can snapshot the full solver state — final
temperatures, flux fields, convergence statistics — and resume a
solve from a saved temperature profile.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["save_solution", "load_solution", "resume_state"]

_FIELDS = ("flux", "final_temps", "temp_history", "n_history", "dtaus",
           "F_up", "F_down", "n_iterations", "converged",
           "max_dT_history", "loop_temps", "loop_F_up", "loop_F_down")


def save_solution(path, result, **extra) -> Path:
    """Persist an :class:`frei_tpu.rt.solver.RTResult` (single column
    or batched) plus optional metadata arrays to an npz file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {k: np.asarray(getattr(result, k)) for k in _FIELDS}
    for k, v in extra.items():
        payload[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)
    return path


def load_solution(path) -> dict:
    """Load a saved solution as a dict of numpy arrays.  The
    ``final_temps`` entry can seed a resumed solve via
    ``Grid(..., init_temperatures=...)``."""
    with np.load(Path(path), allow_pickle=False) as d:
        return {k: d[k] for k in d.files}


def resume_state(path):
    """Load the pieces needed to continue a checkpointed solve:
    ``(loop_temps, (loop_F_up, loop_F_down))`` — the PRE-final-emit
    state, so resuming via ``solve_rc_batched(temps, ...,
    init_fluxes=fluxes)`` continues the original emit/absorb sequence
    exactly (the convergence statistics restart — they only affect
    the stopping rule)."""
    d = load_solution(path)
    return d["loop_temps"], (d["loop_F_up"], d["loop_F_down"])
