"""Pure-pytree policy / value / critic networks for the RL stack.

The reference trains BC / PPO / SAC / GAIL through an external ``method``
package (``run.py:1-18``; algorithms listed at ``README.md:95-122``) with
torch MLPs synchronized over MPI (``util/pytorch.py:139-227``). Here the
networks are explicit parameter pytrees + pure ``apply`` functions so the
whole update step jits, shards with ``shard_map``, and syncs gradients with
a single ``psum`` over the device mesh instead of host MPI allreduce.

All dense layers are sized for the MXU (batch-major matmuls, bf16-friendly);
observations are flat vectors produced by ``flatten_obs``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

LOG_STD_MIN, LOG_STD_MAX = -10.0, 2.0


def flatten_obs(obs: dict) -> jax.Array:
    """Deterministic dict→vector flattening (sorted keys, ravel + concat).
    Works batched: leading axes are preserved."""
    lead = _lead(obs)
    flat = [
        obs[k].reshape(obs[k].shape[:lead] + (-1,)).astype(jnp.float32)
        for k in sorted(obs)
    ]
    return jnp.concatenate(flat, axis=-1)


def _lead(obs: dict) -> int:
    """Number of leading batch axes, inferred from the smallest-rank leaf
    (obs dicts are uniformly batched by vmap)."""
    return min(v.ndim for v in obs.values()) - 1 if obs else 0


def obs_dim(obs: dict) -> int:
    return int(sum(int(np.prod(v.shape[_lead(obs):])) for v in obs.values()))


def init_mlp(key, sizes: Sequence[int], final_scale: float = 1.0):
    """Orthogonal-init MLP parameter pytree: list of (W, b)."""
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, k in enumerate(keys):
        fan_in, fan_out = sizes[i], sizes[i + 1]
        w = jax.nn.initializers.orthogonal(
            np.sqrt(2.0) if i < len(keys) - 1 else final_scale
        )(k, (fan_in, fan_out), jnp.float32)
        params.append({"w": w, "b": jnp.zeros((fan_out,), jnp.float32)})
    return params


def mlp_apply(params, x, activation=jax.nn.tanh):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = activation(x)
    return x


# -- diagonal-gaussian policy -------------------------------------------------

def init_policy(key, obs_d: int, act_d: int, hidden=(256, 256)):
    k1, _ = jax.random.split(key)
    return {
        "trunk": init_mlp(k1, (obs_d, *hidden, act_d), final_scale=0.01),
        "log_std": jnp.full((act_d,), -0.5, jnp.float32),
    }


def policy_dist(params, obs_vec):
    mean = mlp_apply(params["trunk"], obs_vec)
    log_std = jnp.clip(params["log_std"], LOG_STD_MIN, LOG_STD_MAX)
    return mean, log_std


def policy_sample(params, obs_vec, key):
    mean, log_std = policy_dist(params, obs_vec)
    eps = jax.random.normal(key, mean.shape)
    action = mean + jnp.exp(log_std) * eps
    return action, gaussian_logp(action, mean, log_std)


def gaussian_logp(x, mean, log_std):
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * ((x - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi)), -1
    )


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))


# -- tanh-gaussian (SAC) ------------------------------------------------------

def init_tanh_policy(key, obs_d: int, act_d: int, hidden=(256, 256)):
    return {"trunk": init_mlp(key, (obs_d, *hidden, 2 * act_d), final_scale=0.01)}


def tanh_policy_sample(params, obs_vec, key):
    out = mlp_apply(params["trunk"], obs_vec, activation=jax.nn.relu)
    mean, log_std = jnp.split(out, 2, axis=-1)
    log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
    eps = jax.random.normal(key, mean.shape)
    pre = mean + jnp.exp(log_std) * eps
    action = jnp.tanh(pre)
    logp = gaussian_logp(pre, mean, log_std) - jnp.sum(
        2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)), -1
    )
    return action, logp, jnp.tanh(mean)


# -- value / critic -----------------------------------------------------------

def init_value(key, obs_d: int, hidden=(256, 256)):
    return init_mlp(key, (obs_d, *hidden, 1), final_scale=1.0)


def value_apply(params, obs_vec):
    return mlp_apply(params, obs_vec)[..., 0]


def init_q(key, obs_d: int, act_d: int, hidden=(256, 256)):
    return init_mlp(key, (obs_d + act_d, *hidden, 1), final_scale=1.0)


def q_apply(params, obs_vec, action):
    return mlp_apply(params, jnp.concatenate([obs_vec, action], -1),
                     activation=jax.nn.relu)[..., 0]
