from .api import chemistry
from .fastchem import (ChemTable, FastChemJAX, equilibrium_log_pressures,
                       load_chem_table)
from .mocks import MockChemistry
from .names import (ATOMIC_MASS, iso_to_mass_amu, iso_to_mass_g,
                    iso_to_species, species_name_to_common_isotopologue_name,
                    species_name_to_fastchem_name)
