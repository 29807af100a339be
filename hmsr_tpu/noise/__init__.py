from .fast_monte_carlo import (run_fast_MC, get_non_linearity_bound,
                               monte_carlo_curves, load_noise_curves, round_iso)

__all__ = ["run_fast_MC", "get_non_linearity_bound", "monte_carlo_curves",
           "load_noise_curves", "round_iso"]
