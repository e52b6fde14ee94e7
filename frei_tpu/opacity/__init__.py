from .etl import (OpacityStore, binned_opacity_stack, binned_opacity_tables,
                  download_atom, download_molecule, load_store,
                  make_synthetic_store, netcdf_to_store,
                  opacity_dir_to_store)
from .rayleigh import rayleigh_h2, rayleigh_he, rayleigh_total
from .tables import (OpacityStack, interp_tp, kappa_from_stack,
                     load_example_opacity, make_opacity_stack)
