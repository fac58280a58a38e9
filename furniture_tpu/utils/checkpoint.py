"""Training checkpoint save/restore.

The reference keeps RL checkpoints in its (absent) ``method`` package and
only ships the path logic (``util/pytorch.py:27-48`` ``get_ckpt_path``:
``ckpt_<step>.pt`` files in a run dir, resume from the newest). Here the
checkpoint is the whole training-state pytree (params + optimizer state +
RNG + step; env states are arrays too, so they round-trip the same way),
serialized with ``flax.serialization`` against a template of the same
structure.

Files are ``ckpt_<step>.msgpack`` in the run dir, written atomically
(tmp + rename) so an interrupted save never corrupts the newest
checkpoint.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax

_CKPT_RE = re.compile(r"^ckpt_(\d+)\.msgpack$")


def ckpt_path(run_dir: str, step: int) -> str:
    """``<run_dir>/ckpt_<step>.msgpack`` (reference ``get_ckpt_path``,
    ``util/pytorch.py:27-48``)."""
    return os.path.join(run_dir, f"ckpt_{step}.msgpack")


def latest_checkpoint(run_dir: str) -> str | None:
    """Newest checkpoint file in ``run_dir``, or None."""
    if not os.path.isdir(run_dir):
        return None
    best_step, best = -1, None
    for name in os.listdir(run_dir):
        m = _CKPT_RE.match(name)
        if m and int(m.group(1)) > best_step:
            best_step, best = int(m.group(1)), os.path.join(run_dir, name)
    return best


def save_checkpoint(run_dir: str, state: Any, step: int, keep: int = 3) -> str:
    """Serialize ``state`` (any pytree) to ``ckpt_<step>.msgpack``.

    Keeps the ``keep`` newest checkpoints, pruning older ones."""
    from flax import serialization

    os.makedirs(run_dir, exist_ok=True)
    state = jax.device_get(state)
    path = ckpt_path(run_dir, step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
    os.replace(tmp, path)

    steps = sorted(
        int(m.group(1))
        for m in (_CKPT_RE.match(n) for n in os.listdir(run_dir))
        if m
    )
    for old in steps[:-keep] if keep > 0 else []:
        try:
            os.remove(ckpt_path(run_dir, old))
        except OSError:
            pass
    return path


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`. ``template`` must
    have the same structure (e.g. a freshly ``init``-ed training state)."""
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def checkpoint_step(path: str) -> int:
    """Step number encoded in a checkpoint filename."""
    m = _CKPT_RE.match(os.path.basename(path))
    if not m:
        raise ValueError(f"not a checkpoint path: {path}")
    return int(m.group(1))
