"""Parity test against the reference's shipped demonstration
(``/root/reference/demos/Cursor_7.pkl``): replay the recorded action
sequence open-loop through our engine (the reference's own implicit
determinism test, ``run_demo_actions``, ``env/furniture.py:2581``) and check
the trajectory stays close and the first assembly connect reproduces.

The demo was recorded at move_speed=0.025 (the recorded cursor rest height
is move_speed/2 = 0.0125) with the cursor env's alignment overrides
(``config/furniture_cursor.py``: project_dist=0).
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furniture_tpu.config import AlignConfig, EnvConfig
from furniture_tpu.envs.cursor import CursorEnv

DEMO = "/root/reference/demos/Cursor_7.pkl"


@pytest.mark.skipif(not os.path.exists(DEMO), reason="reference demo absent")
def test_replay_reference_cursor_demo():
    with open(DEMO, "rb") as f:
        demo = pickle.load(f)

    env = CursorEnv(
        EnvConfig(
            furniture_name="swivel_chair_0700",
            move_speed=0.025,
            align=AlignConfig(project_dist=0.0),
        )
    )
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    q0 = demo["qpos"][0]
    pos = np.asarray(s.parts.pos).copy()
    quat = np.asarray(s.parts.quat).copy()
    for i, name in enumerate(env.model.part_names):
        pos[i] = q0[name][:3]
        quat[i] = q0[name][3:]
    s = s._replace(
        parts=s.parts._replace(pos=jnp.asarray(pos), quat=jnp.asarray(quat)),
        cursor_pos=jnp.asarray(np.stack([q0["cursor0"], q0["cursor1"]])),
    )

    step = jax.jit(env.step)
    part_errs, cursor_errs = [], []
    for t, a in enumerate(demo["actions"]):
        s, obs, rew, done, info = step(s, jnp.asarray(a, jnp.float32))
        qt = demo["qpos"][t + 1]
        ref_pos = np.stack(
            [np.asarray(qt[n][:3]) for n in env.model.part_names]
        )
        part_errs.append(
            float(
                np.linalg.norm(np.asarray(s.parts.pos) - ref_pos, axis=-1).mean()
            )
        )
        cref = np.stack([qt["cursor0"], qt["cursor1"]])
        cursor_errs.append(
            float(np.linalg.norm(np.asarray(s.cursor_pos) - cref, axis=-1).mean())
        )

    assert np.isfinite(np.asarray(s.parts.pos)).all()
    # the demo's first chair connect must reproduce in our engine
    assert int(s.num_connected) >= 1, "replay did not reproduce the connect"
    # kinematic cursor trajectory tracks the recording closely
    assert np.mean(cursor_errs) < 0.15, f"cursor err {np.mean(cursor_errs)}"
    # free-part trajectories stay within tolerance despite solver differences
    assert np.mean(part_errs) < 0.25, f"part err {np.mean(part_errs)}"
