"""Misc optimization/debug helpers (reference utils/opt_utils.py).

- rainbow vertex colors for debugging correspondence (the reference fits a
  sklearn MinMaxScaler over template xyz and uses it as RGB)
- min-max scaling helper
"""

from __future__ import annotations

import numpy as np


def min_max_scale(x: np.ndarray, axis: int = 0) -> np.ndarray:
    x = np.asarray(x, np.float32)
    lo = x.min(axis=axis, keepdims=True)
    hi = x.max(axis=axis, keepdims=True)
    return (x - lo) / np.maximum(hi - lo, 1e-9)


def get_vert_colors(v_template: np.ndarray) -> np.ndarray:
    """Rainbow debug colors: template xyz min-max scaled into RGB
    (opt_utils.get_mano_vert_colors semantics)."""
    return min_max_scale(np.asarray(v_template), axis=0)
