"""Physics state pytree for furniture parts."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PartState(NamedTuple):
    """Pose + velocity of every furniture part (one env; vmap for batch).

    ``pos``/``quat`` is the part *body-origin* pose, matching the reference's
    free-joint qpos layout (``env/furniture.py:3121-3288`` pos/quat getters).
    ``lin_vel``/``ang_vel`` are **group** velocities replicated onto every
    member part (world frame; angular about the group COM).
    """

    pos: jax.Array       # [P,3]
    quat: jax.Array      # [P,4] wxyz
    lin_vel: jax.Array   # [P,3]
    ang_vel: jax.Array   # [P,3]


def init_state(pos, quat) -> PartState:
    pos = jnp.asarray(pos, jnp.float32)
    quat = jnp.asarray(quat, jnp.float32)
    return PartState(
        pos=pos,
        quat=quat,
        lin_vel=jnp.zeros_like(pos),
        ang_vel=jnp.zeros_like(pos),
    )
