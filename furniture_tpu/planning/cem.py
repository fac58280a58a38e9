"""Cross-entropy-method planner: elite-refit counterpart to MPPI."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .mppi import assembly_cost


@dataclass(frozen=True)
class CEMConfig:
    horizon: int = 16
    n_samples: int = 256
    n_elite: int = 32
    sigma_init: float = 0.5
    sigma_min: float = 0.05
    alpha: float = 0.2  # mean/std smoothing


def make_cem(env, cfg: CEMConfig, cost_fn=None):
    """(state, mean[H,dof], sigma[H,dof], key) -> (mean, sigma, info)."""
    cost_fn = cost_fn or assembly_cost(env)
    H, S, dof = cfg.horizon, cfg.n_samples, env.dof

    def rollout_return(state, actions):
        def body(carry, a):
            st, total = carry
            st, _, rew, _, _ = env.step(st, a)
            return (st, total + cost_fn(st) - rew), None

        (_, total), _ = jax.lax.scan(body, (state, jnp.float32(0.0)), actions)
        return total

    def plan(state, mean, sigma, key):
        noise = jax.random.normal(key, (S, H, dof))
        samples = jnp.clip(mean[None] + sigma[None] * noise, -1.0, 1.0)
        costs = jax.vmap(lambda a: rollout_return(state, a))(samples)
        _, elite_idx = jax.lax.top_k(-costs, cfg.n_elite)
        elite = samples[elite_idx]
        new_mean = cfg.alpha * mean + (1 - cfg.alpha) * elite.mean(0)
        new_sigma = cfg.alpha * sigma + (1 - cfg.alpha) * elite.std(0)
        new_sigma = jnp.maximum(new_sigma, cfg.sigma_min)
        info = {"best_cost": costs[elite_idx[0]]}
        return new_mean, new_sigma, info

    return plan
