"""Per-step info aggregation (reference ``util/info_dict.py:9-56``)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np


class Info:
    """Accumulates per-step info dicts; reduces scalars to means and keeps
    history lists otherwise."""

    def __init__(self, info=None):
        self._history = defaultdict(list)
        if info:
            self.add(info)

    def add(self, info):
        if info is None:
            return
        if isinstance(info, Info):
            for k, v in info._history.items():
                self._history[k].extend(v)
        elif isinstance(info, dict):
            for k, v in info.items():
                if isinstance(v, (list, tuple)):
                    self._history[k].extend(v)
                else:
                    self._history[k].append(v)

    def get_dict(self, reduction: str = "mean", only_scalar: bool = False):
        out = {}
        for k, v in self._history.items():
            if np.isscalar(v[0]) or (hasattr(v[0], "ndim") and v[0].ndim == 0):
                arr = np.asarray(v, dtype=np.float64)
                out[k] = arr.mean() if reduction == "mean" else arr.sum()
            elif not only_scalar:
                out[k] = v
        self.clear()
        return out

    def clear(self):
        self._history = defaultdict(list)

    def __getitem__(self, k):
        return self._history[k]

    def __contains__(self, k):
        return k in self._history

    def keys(self):
        return self._history.keys()
