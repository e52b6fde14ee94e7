from .rayleigh import rayleigh_h2, rayleigh_he, rayleigh_total
from .tables import (OpacityStack, interp_tp, kappa_from_stack,
                     load_example_opacity, make_opacity_stack)
