"""SAC with an on-device replay buffer.

Reference surface: ``python -m run --algo sac`` (``README.md:95-103``; the
implementation lived in the absent ``method`` package). TPU-native design:
the replay buffer is a fixed-size array pytree living in device memory, the
(env step → buffer insert → gradient update) loop is one jitted program,
and batch collection uses the same vmapped envs as PPO.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from . import networks as N


@dataclass(frozen=True)
class SACConfig:
    num_envs: int = 64
    buffer_size: int = 100_000
    batch_size: int = 256
    gamma: float = 0.99
    tau: float = 0.005
    lr: float = 3e-4
    hidden: tuple = (256, 256)
    target_entropy_scale: float = 1.0   # target = -scale * act_d
    updates_per_step: int = 1
    warmup: int = 1000                  # env transitions before updates start


class Buffer(NamedTuple):
    obs: jax.Array        # [N, obs_d]
    action: jax.Array     # [N, act_d]
    reward: jax.Array     # [N]
    next_obs: jax.Array   # [N, obs_d]
    done: jax.Array       # [N]
    ptr: jax.Array        # scalar
    size: jax.Array       # scalar


class SACState(NamedTuple):
    params: Any           # {"pi","q1","q2","q1_t","q2_t","log_alpha"}
    opt_state: Any
    buffer: Buffer
    env_states: Any
    key: jax.Array
    step: jax.Array


def make_sac(env, cfg: SACConfig = SACConfig()):
    """Returns ``(init, train_iter)``; each ``train_iter`` steps every env
    lane once, inserts the transitions, and runs gradient updates."""
    B = cfg.num_envs
    probe_obs = env.observe(env.reset(jax.random.PRNGKey(0)))
    obs_d = N.obs_dim(probe_obs)
    act_d = env.dof
    target_entropy = -cfg.target_entropy_scale * act_d

    tx = optax.adam(cfg.lr)

    def init(key) -> SACState:
        ks = jax.random.split(key, 6)
        params = {
            "pi": N.init_tanh_policy(ks[0], obs_d, act_d, cfg.hidden),
            "q1": N.init_q(ks[1], obs_d, act_d, cfg.hidden),
            "q2": N.init_q(ks[2], obs_d, act_d, cfg.hidden),
            "log_alpha": jnp.zeros(()),
        }
        params["q1_t"] = jax.tree.map(jnp.copy, params["q1"])
        params["q2_t"] = jax.tree.map(jnp.copy, params["q2"])
        buf = Buffer(
            obs=jnp.zeros((cfg.buffer_size, obs_d)),
            action=jnp.zeros((cfg.buffer_size, act_d)),
            reward=jnp.zeros((cfg.buffer_size,)),
            next_obs=jnp.zeros((cfg.buffer_size, obs_d)),
            done=jnp.zeros((cfg.buffer_size,)),
            ptr=jnp.array(0),
            size=jnp.array(0),
        )
        env_states = jax.vmap(env.reset)(jax.random.split(ks[3], B))
        opt = tx.init((params["pi"], params["q1"], params["q2"], params["log_alpha"]))
        return SACState(params, opt, buf, env_states, ks[4], jnp.array(0))

    def _insert(buf: Buffer, obs, action, reward, next_obs, done) -> Buffer:
        idx = (buf.ptr + jnp.arange(B)) % cfg.buffer_size
        return Buffer(
            obs=buf.obs.at[idx].set(obs),
            action=buf.action.at[idx].set(action),
            reward=buf.reward.at[idx].set(reward),
            next_obs=buf.next_obs.at[idx].set(next_obs),
            done=buf.done.at[idx].set(done.astype(jnp.float32)),
            ptr=(buf.ptr + B) % cfg.buffer_size,
            size=jnp.minimum(buf.size + B, cfg.buffer_size),
        )

    def _losses(params, batch, key):
        obs, action, reward, next_obs, done = batch
        alpha = jnp.exp(params["log_alpha"])
        next_a, next_logp, _ = N.tanh_policy_sample(params["pi"], next_obs, key)
        q_next = jnp.minimum(
            N.q_apply(params["q1_t"], next_obs, next_a),
            N.q_apply(params["q2_t"], next_obs, next_a),
        )
        target = reward + cfg.gamma * (1.0 - done) * (
            q_next - alpha * next_logp
        )
        target = jax.lax.stop_gradient(target)
        q1 = N.q_apply(params["q1"], obs, action)
        q2 = N.q_apply(params["q2"], obs, action)
        q_loss = jnp.mean((q1 - target) ** 2) + jnp.mean((q2 - target) ** 2)

        new_a, logp, _ = N.tanh_policy_sample(params["pi"], obs, key)
        q_pi = jnp.minimum(
            N.q_apply(jax.lax.stop_gradient(params["q1"]), obs, new_a),
            N.q_apply(jax.lax.stop_gradient(params["q2"]), obs, new_a),
        )
        pi_loss = jnp.mean(alpha * logp - q_pi)
        alpha_loss = -jnp.mean(
            params["log_alpha"] * jax.lax.stop_gradient(logp + target_entropy)
        )
        return q_loss + pi_loss + alpha_loss, {
            "q_loss": q_loss,
            "pi_loss": pi_loss,
            "alpha": alpha,
            "entropy": -jnp.mean(logp),
        }

    def _update(params, opt_state, buf: Buffer, key):
        k_idx, k_loss = jax.random.split(key)
        idx = jax.random.randint(k_idx, (cfg.batch_size,), 0, jnp.maximum(buf.size, 1))
        batch = (buf.obs[idx], buf.action[idx], buf.reward[idx],
                 buf.next_obs[idx], buf.done[idx])

        def total_loss(trainable):
            pi, q1, q2, log_alpha = trainable
            p = {**params, "pi": pi, "q1": q1, "q2": q2, "log_alpha": log_alpha}
            return _losses(p, batch, k_loss)

        trainable = (params["pi"], params["q1"], params["q2"], params["log_alpha"])
        (loss, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        pi, q1, q2, log_alpha = optax.apply_updates(trainable, updates)
        polyak = lambda t, s: jax.tree.map(
            lambda a, b: (1 - cfg.tau) * a + cfg.tau * b, t, s
        )
        params = {
            "pi": pi, "q1": q1, "q2": q2, "log_alpha": log_alpha,
            "q1_t": polyak(params["q1_t"], q1),
            "q2_t": polyak(params["q2_t"], q2),
        }
        return params, opt_state, aux

    @jax.jit
    def train_iter(state: SACState):
        key, k_act, k_reset, k_upd = jax.random.split(state.key, 4)
        obs = N.flatten_obs(jax.vmap(env.observe)(state.env_states))
        warm = state.step * B < cfg.warmup
        a_rand = jax.random.uniform(k_act, (B, act_d), minval=-1.0, maxval=1.0)
        a_pi, _, _ = N.tanh_policy_sample(state.params["pi"], obs, k_act)
        action = jnp.where(warm, a_rand, a_pi)
        env_states, _, rew, done, _ = jax.vmap(env.step)(state.env_states, action)
        next_obs = N.flatten_obs(jax.vmap(env.observe)(env_states))
        buf = _insert(state.buffer, obs, action, rew, next_obs, done)
        fresh = jax.vmap(env.reset)(jax.random.split(k_reset, B))
        env_states = jax.tree.map(
            lambda new, old: jnp.where(
                done.reshape((B,) + (1,) * (old.ndim - 1)), new, old
            ),
            fresh,
            env_states,
        )

        def do_updates(args):
            params, opt_state = args
            def body(carry, k):
                params, opt_state = carry
                params, opt_state, aux = _update(params, opt_state, buf, k)
                return (params, opt_state), aux
            (params, opt_state), aux = jax.lax.scan(
                (body), (params, opt_state),
                jax.random.split(k_upd, cfg.updates_per_step),
            )
            return params, opt_state, jax.tree.map(jnp.mean, aux)

        def no_updates(args):
            params, opt_state = args
            zero = {"q_loss": 0.0, "pi_loss": 0.0,
                    "alpha": jnp.exp(params["log_alpha"]), "entropy": 0.0}
            return params, opt_state, jax.tree.map(jnp.asarray, zero)

        params, opt_state, aux = jax.lax.cond(
            warm, no_updates, do_updates, (state.params, state.opt_state)
        )
        metrics = {**aux, "reward_per_step": jnp.mean(rew)}
        return (
            SACState(params, opt_state, buf, env_states, key, state.step + 1),
            metrics,
        )

    return init, train_iter
