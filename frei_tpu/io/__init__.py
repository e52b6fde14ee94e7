from .cache import (binned_cache_dir, cache_root, grid_fingerprint,
                    load_binned_cache, opacity_store_dir, save_binned_cache)
from .checkpoint import load_solution, resume_state, save_solution
