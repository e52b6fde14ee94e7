"""Species-name algebra tests (parity with the reference's
parametrized suite, `frei/tests/test_chemistry.py:70-109`)."""

import pytest

from frei_tpu.chemistry.names import (
    iso_to_mass_amu, iso_to_species,
    species_name_to_common_isotopologue_name, species_name_to_fastchem_name)


@pytest.mark.parametrize("iso, species", [
    ("1H2-16O", "H2O"), ("Na", "Na"), ("K", "K"), ("48Ti-16O", "TiO"),
])
def test_iso_to_species(iso, species):
    assert iso_to_species(iso) == species


@pytest.mark.parametrize("species, fastchem", [
    ("H2O", "H2O1"), ("TiO", "O1Ti1"), ("VO", "O1V1"), ("Na", "Na"),
    ("K", "K"), ("CO", "C1O1"), ("CrH", "Cr1H1"), ("CF4O", "C1F4O1"),
    ("Al2Cl6", "Al2Cl6"), ("AlNaF4", "Al1F4Na1"), ("ClAlF2", "Al1Cl1F2"),
])
def test_species_to_fastchem(species, fastchem):
    assert species_name_to_fastchem_name(species) == fastchem


@pytest.mark.parametrize("species, iso", [
    ("H2O", "1H2-16O"), ("TiO", "48Ti-16O"), ("VO", "51V-16O"),
    ("Na", "Na"), ("K", "K"), ("CO", "12C-16O"), ("CrH", "52Cr-1H"),
    ("CF4O", "12C-19F4-16O"), ("Al2Cl6", "27Al2-35Cl6"),
    ("AlClF2", "27Al-35Cl-19F2"),
])
def test_species_to_iso(species, iso):
    assert species_name_to_common_isotopologue_name(species) == iso


@pytest.mark.parametrize("iso", [
    "1H2-16O", "48Ti-16O", "51V-16O", "Na", "K", "12C-16O", "52Cr-1H",
    "12C-19F4-16O", "27Al2-35Cl6", "27Al-35Cl-19F2",
])
def test_roundtrip(iso):
    assert species_name_to_common_isotopologue_name(iso_to_species(iso)) == iso


def test_iso_masses():
    assert iso_to_mass_amu("1H2-16O") == 18.0
    assert iso_to_mass_amu("48Ti-16O") == 64.0
    assert abs(iso_to_mass_amu("Na") - 22.98976928) < 1e-9
