"""Build the equilibrium-chemistry tables npz from FastChem-format inputs.

Parses a FastChem logK file (5-coefficient equilibrium-constant fits,
``ln K = a1/T + a2 ln T + a3 + a4 T + a5 T^2``, one header line naming
the species and its element stoichiometry followed by one coefficient
line) and a solar-abundance file (``element  log10(eps)+12``), and
writes a compact binary table consumed by
``frei_tpu.chemistry.fastchem``:

    elements       (E,)   str   element symbols, 'e-' last if present
    abundances     (E,)   f8    eps_j = 10**(A_j - 12), e- forced to 0
    species        (S,)   str   Hill-notation gas-species names
    stoich         (S, E) i4    element counts per species (e- signed)
    logk_coeffs    (S, 5) f8
    species_mass   (S,)   f8    amu, from the stoichiometry

Usage:
    python tools/build_chem_tables.py <logK.dat> <abundances.dat> <out.npz>

The shipped ``frei_tpu/chemistry/data/chem_tables.npz`` was built from
the FastChem input data distributed with the reference package
(`/root/reference/frei/data/logK.dat`, 1487 lines of JANAF-fit
coefficients, and ``element_abundances_solar.dat``, Asplund et
al. 2009) — the same third-party data files the reference feeds to the
C++ FastChem solver (`frei/chemistry.py:155-163`).
"""

from __future__ import annotations

import sys

import numpy as np

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from frei_tpu.chemistry.names import ATOMIC_MASS  # noqa: E402


def parse_abundances(path):
    elements, abund = [], []
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        sym, val = line.split()
        elements.append(sym)
        abund.append(0.0 if sym == "e-" else 10.0 ** (float(val) - 12.0))
    return elements, np.array(abund)


def parse_logk(path, elements):
    eidx = {e: i for i, e in enumerate(elements)}
    species, stoich, coeffs = [], [], []
    header = None
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if header is None:
            header = line
            continue
        # coefficient line follows its header
        name, rest = header.split(None, 1)
        comp = rest.split(":", 1)[1].split("#")[0].split()
        nu = np.zeros(len(elements), dtype=np.int32)
        for sym, count in zip(comp[0::2], comp[1::2]):
            nu[eidx[sym]] += int(count)
        c = np.array([float(x) for x in line.split()])
        if c.shape != (5,):
            raise ValueError(f"bad coefficient line for {name}: {line!r}")
        species.append(name)
        stoich.append(nu)
        coeffs.append(c)
        header = None
    return species, np.array(stoich), np.array(coeffs)


def build(logk_path, abund_path, out_path):
    elements, abundances = parse_abundances(abund_path)
    # put e- last for readability
    if "e-" in elements:
        i = elements.index("e-")
        order = [j for j in range(len(elements)) if j != i] + [i]
        elements = [elements[j] for j in order]
        abundances = abundances[order]
    species, stoich, coeffs = parse_logk(logk_path, elements)
    mass = np.array([
        sum(ATOMIC_MASS[e] * abs(int(n))
            for e, n in zip(elements, nu) if n != 0)
        for nu in stoich
    ])
    np.savez_compressed(
        out_path,
        elements=np.array(elements),
        abundances=abundances,
        species=np.array(species),
        stoich=stoich,
        logk_coeffs=coeffs,
        species_mass=mass,
    )
    print(f"wrote {out_path}: {len(elements)} elements, "
          f"{len(species)} gas species")


if __name__ == "__main__":
    build(sys.argv[1], sys.argv[2], sys.argv[3])
