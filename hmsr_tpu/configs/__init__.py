"""Config system: YAML defaults + validation + SNR-adaptive hyperparameters.

The reference uses OmegaConf (reference run_handheld.py:94-116); that package
is not a dependency here, so :mod:`confignode` provides the small subset of
semantics the pipeline needs (attribute access, merge, dotted update, YAML io).
"""

from .confignode import ConfigNode, load_yaml, merge, update, default_config
from .params import sanitize_config, update_snr_config, lerp

__all__ = [
    "ConfigNode",
    "load_yaml",
    "merge",
    "update",
    "default_config",
    "sanitize_config",
    "update_snr_config",
    "lerp",
]
