from .plot import contribution_function, dashboard
from .telemetry import (SolveMetrics, enable_nan_debugging, profile_trace,
                        progress_printer)
