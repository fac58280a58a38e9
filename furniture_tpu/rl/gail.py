"""GAIL: adversarial imitation on top of PPO.

Reference surface: ``python -m run --algo gail --demo_path ...`` launched
under ``mpirun -np 32`` (``README.md:104-113``; implementation in the absent
``method`` package). Here the discriminator is a jitted MLP trained on
expert-vs-policy batches, and its ``-log(1-D)`` reward plugs into PPO's
``reward_fn`` hook so the whole generator update stays one XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from . import networks as N
from .ppo import PPOConfig, make_ppo


@dataclass(frozen=True)
class GAILConfig:
    lr: float = 3e-4
    hidden: tuple = (256, 256)
    disc_updates: int = 2
    batch_size: int = 256
    grad_penalty: float = 10.0   # WGAN-GP-style stability term
    reward_scale: float = 1.0


class DiscState(NamedTuple):
    params: Any
    opt_state: Any
    key: jax.Array


def make_gail(env, ppo_cfg: PPOConfig, gail_cfg: GAILConfig, expert_obs, expert_act,
              mesh=None):
    """Returns ``(init, train_iter)``.

    ``train_iter(ppo_state, disc_state)`` does one PPO iteration with the
    discriminator reward, then ``disc_updates`` discriminator steps on
    (expert, fresh-policy) batches.
    """
    expert = jnp.concatenate(
        [jnp.asarray(expert_obs, jnp.float32), jnp.asarray(expert_act, jnp.float32)],
        axis=-1,
    )
    tx = optax.adam(gail_cfg.lr)
    in_d = expert.shape[-1]

    def disc_logits(params, x):
        return N.mlp_apply(params, x, activation=jax.nn.relu)[..., 0]

    def disc_reward(params):
        def reward_fn(obs_vec, action, env_rew):
            x = jnp.concatenate([obs_vec, action], -1)
            d = jax.nn.sigmoid(disc_logits(params, x))
            # -log(1 - D): positive when the policy fools the discriminator
            return gail_cfg.reward_scale * (-jnp.log(jnp.clip(1.0 - d, 1e-6)))
        return reward_fn

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        params = N.init_mlp(k1, (in_d, *gail_cfg.hidden, 1))
        return DiscState(params, tx.init(params), k3), k2

    def disc_loss(params, expert_x, policy_x, key):
        le = disc_logits(params, expert_x)
        lp = disc_logits(params, policy_x)
        bce = jnp.mean(jax.nn.softplus(-le)) + jnp.mean(jax.nn.softplus(lp))
        # gradient penalty on interpolates
        eps = jax.random.uniform(key, (expert_x.shape[0], 1))
        mid = eps * expert_x + (1 - eps) * policy_x
        g = jax.vmap(jax.grad(lambda x: disc_logits(params, x[None])[0]))(mid)
        gp = jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
        return bce + gail_cfg.grad_penalty * gp, {
            "disc_bce": bce,
            "disc_acc": 0.5 * (jnp.mean(le > 0) + jnp.mean(lp < 0)),
        }

    @jax.jit
    def disc_update(state: DiscState, policy_obs, policy_act):
        policy_x = jnp.concatenate([policy_obs, policy_act], -1)

        def body(carry, k):
            params, opt_state = carry
            ke, kp, kg = jax.random.split(k, 3)
            ei = jax.random.randint(ke, (gail_cfg.batch_size,), 0, expert.shape[0])
            pi = jax.random.randint(kp, (gail_cfg.batch_size,), 0, policy_x.shape[0])
            (loss, aux), grads = jax.value_and_grad(disc_loss, has_aux=True)(
                params, expert[ei], policy_x[pi], kg
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), aux

        key, sub = jax.random.split(state.key)
        (params, opt_state), aux = jax.lax.scan(
            body,
            (state.params, state.opt_state),
            jax.random.split(sub, gail_cfg.disc_updates),
        )
        return DiscState(params, opt_state, key), jax.tree.map(jnp.mean, aux)

    return init, disc_reward, disc_update, make_ppo
