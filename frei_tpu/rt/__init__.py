from .physics import PhysicsParams
from .solver import RTConstants, RTResult, SolverConfig, solve_rc
from .sweeps import absorb_sweep, emit_sweep
