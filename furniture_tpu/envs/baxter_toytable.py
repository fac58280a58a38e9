"""Baxter toy-table flip task (reference ``furniture_baxter_toytable.py``):
the bimanual Baxter must grasp the upside-down table top with both hands,
flip it upright, and bring it near the target position.

Reference semantics (citations into /root/reference):
* furniture is pinned to ``toy_table_flip`` (:21)
* fixed initial placement with noise (``_place_objects`` :61-86)
* two-stage reward (``_compute_reward`` :100-165): grip-hand distances while
  the top's connector up-vector points down, flip/lift shaping, success at
  ``rot_dist_up > 0.98`` and table within 0.2 m of the target
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import transforms as T
from ..config import EnvConfig
from ..robots import kinematics as K
from .arm import ArmEnv, ArmState

_TARGET_TABLE_POS = np.array([0.2, -0.1, 0.15])  # :58

# fixed initial placement (:70-84)
_POS_INIT = {
    "4_part4": [-0.1968, -0.0288, 0.03878],
    "2_part2": [0.2, 0.16578, 0.02379],
}
_QUAT_INIT = {
    "4_part4": [0.099711762, 0.00028753, 0.00037843, 0.07586979],
    "2_part2": [-0.6725, 0.6417, -0.2970, -0.2186],
}


class FurnitureBaxterToyTableEnv(ArmEnv):
    def __init__(self, config: EnvConfig | None = None, model=None):
        config = (config or EnvConfig()).replace(
            agent_type="Baxter", furniture_name="toy_table_flip"
        )
        super().__init__(config, model)
        m = self.model
        self._table_idx = m.part_names.index("4_part4")
        site2id = {n: i for i, n in enumerate(m.site_names)}
        self._r_site = site2id["4_part4_right_site"]
        self._l_site = site2id["4_part4_left_site"]
        conn2id = {n: i for i, n in enumerate(m.conn_names)}
        self._top_conn = conn2id["top-leg,,conn_site4"]

    def reset(self, key) -> ArmState:
        state = super().reset(key)
        # fixed placement + noise (reference _place_objects)
        noise = self.config.furn_xyz_rand * jax.random.uniform(
            key, (len(_POS_INIT) * 3,), minval=-1.0, maxval=1.0
        )
        pos = np.asarray(self.model.part_names, dtype=object)
        new_pos = []
        new_quat = []
        for i, name in enumerate(self.model.part_names):
            p = jnp.asarray(_POS_INIT[name], jnp.float32) + noise[3 * i : 3 * i + 3]
            q = jnp.asarray(_QUAT_INIT[name], jnp.float32)
            new_pos.append(p)
            new_quat.append(T.quat_normalize(q))
        parts = state.parts._replace(
            pos=jnp.stack(new_pos),
            quat=jnp.stack(new_quat),
            lin_vel=jnp.zeros_like(state.parts.lin_vel),
            ang_vel=jnp.zeros_like(state.parts.ang_vel),
        )
        return state._replace(parts=parts)

    def _site_world_pos(self, parts, site_idx):
        m = self.model
        p = int(m.site_part[site_idx])
        local = jnp.asarray(m.site_pos[site_idx], jnp.float32)
        return parts.pos[p] + T.quat_rotate(parts.quat[p], local)

    def step(self, state: ArmState, action):
        state = self.step_physics(state, action)
        state, unstable = self._guard(state)
        state = state._replace(t=state.t + 1)

        # two-stage flip reward (furniture_baxter_toytable.py:100-165)
        m = self.model
        parts = state.parts
        cp = int(m.conn_part[self._top_conn])
        up = T.up_vector_from_quat(parts.quat[cp])
        rot_dist_up = T.cos_siml(up, jnp.array([0.0, 0.0, 1.0]))

        table_pos = parts.pos[self._table_idx]
        table_dist = jnp.linalg.norm(
            table_pos - jnp.asarray(_TARGET_TABLE_POS, jnp.float32)
        )
        table_rot_rew = 0.1 * (rot_dist_up - 1.0)

        fk_out = K.fk(self.robot, state.qpos)
        r_hand, _ = K.site_world(self.robot, fk_out, "right")
        l_hand, _ = K.site_world(self.robot, fk_out, "left")
        r_tgt = self._site_world_pos(parts, self._r_site)
        l_tgt = self._site_world_pos(parts, self._l_site)
        r_gh_dist = jnp.linalg.norm(r_hand - r_tgt)
        l_gh_dist = jnp.linalg.norm(l_hand - l_tgt)
        flipped_down = rot_dist_up < 0
        r_gh_rew = -jnp.where(flipped_down, r_gh_dist, 0.0)
        l_gh_rew = -jnp.where(flipped_down, l_gh_dist, 0.0)

        dz = r_tgt[2] - l_tgt[2]
        lift_rew = jnp.where(
            flipped_down,
            dz,
            jnp.where(table_dist < 0.4, 2.0 * (0.5 - jnp.maximum(dz, 0.0)), 0.0),
        )

        ctrl_rew = -self.config.reward.ctrl_penalty_coef * jnp.linalg.norm(
            action[:12]
        )

        success = (rot_dist_up > 0.98) & (table_dist < 0.2)
        success_rew = jnp.where(success, 100.0, 0.0)
        reward = (
            success_rew + ctrl_rew + table_rot_rew + r_gh_rew + l_gh_rew + lift_rew
            - self.config.reward.unstable_penalty_coef * unstable
        )
        done = success | (state.t >= self.config.max_episode_steps) | unstable
        obs = self.observe(state)
        info = {
            "success": success,
            "unstable": unstable,
            "table_rot_rew": table_rot_rew,
            "lift_rew": lift_rew,
            "r_gh_dist": r_gh_dist,
            "l_gh_dist": l_gh_dist,
            "table_dist": table_dist,
            "ctrl_rew": ctrl_rew,
        }
        return state, obs, reward, done, info
