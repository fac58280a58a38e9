"""Policy evaluation: batched success-rate rollouts.

The reference evaluates trained policies by writing per-episode success
flags to HDF5 eval files that ``collect_results.py:10-32`` aggregates into
success rates. Here evaluation is one jitted program: ``n_episodes``
vmapped env lanes roll the deterministic policy to ``max_steps`` and the
success statistics reduce on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import networks as N


def ppo_act(params, obs_vec, key):
    """Deterministic PPO policy action (distribution mean)."""
    mean, _ = N.policy_dist(params["pi"], obs_vec)
    return mean


def sac_act(params, obs_vec, key):
    """Deterministic SAC policy action (tanh of the pre-squash mean)."""
    _, _, det = N.tanh_policy_sample(params["pi"], obs_vec, key)
    return det


def make_evaluate(env, act_fn, n_episodes: int = 64, max_steps: int = 200):
    """Build ``evaluate(params, key) -> metrics``.

    One env lane per episode (no auto-reset: a lane that finishes holds its
    outcome — matching the reference's episode-per-eval-run accounting).
    Metrics: ``success_rate``, ``mean_reward``, ``mean_episode_len`` (steps
    to success, or ``max_steps`` for failures).
    """

    @jax.jit
    def evaluate(params, key):
        k_reset, k_roll = jax.random.split(key)
        states = jax.vmap(env.reset)(jax.random.split(k_reset, n_episodes))

        def body(carry, t):
            states, succeeded, succ_t, total_rew, key = carry
            key, k_act = jax.random.split(key)
            obs_vec = N.flatten_obs(jax.vmap(env.observe)(states))
            action = act_fn(params, obs_vec, k_act)
            states, _, rew, done, info = jax.vmap(env.step)(states, action)
            success = info["success"].astype(bool)
            newly = success & ~succeeded
            # t is the 0-indexed scan step; the episode took t+1 steps
            succ_t = jnp.where(newly, t + 1, succ_t)
            # accumulate up to and including the success step
            total_rew = total_rew + jnp.where(succeeded, 0.0, rew)
            succeeded = succeeded | success
            return (states, succeeded, succ_t, total_rew, key), None

        succeeded = jnp.zeros(n_episodes, bool)
        succ_t = jnp.full(n_episodes, max_steps, jnp.int32)
        total_rew = jnp.zeros(n_episodes)
        (states, succeeded, succ_t, total_rew, _), _ = jax.lax.scan(
            body,
            (states, succeeded, succ_t, total_rew, k_roll),
            jnp.arange(max_steps),
        )
        return {
            "success_rate": jnp.mean(succeeded.astype(jnp.float32)),
            "mean_reward": jnp.mean(total_rew),
            "mean_episode_len": jnp.mean(succ_t.astype(jnp.float32)),
        }

    return evaluate
