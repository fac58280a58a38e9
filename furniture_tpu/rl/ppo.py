"""PPO, TPU-native: on-device rollouts, GAE, minibatch updates, and
mesh data-parallelism.

Reference surface: ``python -m run --algo ppo`` launched under
``mpirun -np 32`` (``README.md:104-121``) — 32 host processes each stepping
one environment, gradients allreduced with MPI
(``util/pytorch.py:185-227`` ``sync_grads``; ``util/mpi.py:5-38``).

TPU-native redesign: the rollout is a ``lax.scan`` over a ``vmap``-batched
environment (thousands of lanes per chip), the update is one jitted program,
and data-parallelism is ``shard_map`` over a device mesh with a single
``psum`` for gradient averaging — XLA lowers it onto ICI; no host sockets
or MPI in the loop (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import networks as N


@dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 256
    rollout_len: int = 64
    epochs: int = 3
    num_minibatches: int = 4
    gamma: float = 0.99
    lam: float = 0.95
    clip_eps: float = 0.2
    lr: float = 3e-4
    vf_coef: float = 0.5
    ent_coef: float = 1e-3
    max_grad_norm: float = 0.5
    hidden: tuple = (256, 256)
    normalize_adv: bool = True


class PPOState(NamedTuple):
    params: Any          # {"pi": ..., "vf": ...}
    opt_state: Any
    env_states: Any      # vmapped env-state pytree [B, ...]
    key: jax.Array
    step: jax.Array


class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    logp: jax.Array
    value: jax.Array
    reward: jax.Array
    done: jax.Array


def make_ppo(
    env,
    cfg: PPOConfig = PPOConfig(),
    mesh: Mesh | None = None,
    axis: str = "env",
    reward_fn: Callable | None = None,
):
    """Build ``(init, train_iter)`` for PPO on a batched furniture env.

    ``env`` is a CursorEnv/ArmEnv-style object with pure ``reset(key)``,
    ``step(state, action)`` and ``observe(state)``. ``reward_fn(obs_vec,
    action, env_reward)`` optionally overrides the env reward (GAIL plugs
    its discriminator in here). With ``mesh``, rollout lanes shard over
    ``axis`` and gradients are ``pmean``-reduced across it.
    """
    B, T = cfg.num_envs, cfg.rollout_len
    probe_obs = env.observe(env.reset(jax.random.PRNGKey(0)))
    obs_d = N.obs_dim(probe_obs)
    act_d = env.dof

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.lr),
    )

    def init(key) -> PPOState:
        k_pi, k_vf, k_env, k_run = jax.random.split(key, 4)
        params = {
            "pi": N.init_policy(k_pi, obs_d, act_d, cfg.hidden),
            "vf": N.init_value(k_vf, obs_d, cfg.hidden),
        }
        env_states = jax.vmap(env.reset)(jax.random.split(k_env, B))
        return PPOState(params, tx.init(params), env_states, k_run, jnp.array(0))

    def _rollout(params, env_states, key):
        # shard-local lane count (B/n_dev inside shard_map, B outside)
        Bl = jax.tree.leaves(env_states)[0].shape[0]

        def body(carry, _):
            env_states, key = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            obs = jax.vmap(env.observe)(env_states)
            obs_vec = N.flatten_obs(obs)
            action, logp = N.policy_sample(params["pi"], obs_vec, k_act)
            value = N.value_apply(params["vf"], obs_vec)
            env_states, _, rew, done, _ = jax.vmap(env.step)(env_states, action)
            if reward_fn is not None:
                rew = reward_fn(obs_vec, action, rew)
            # auto-reset finished lanes (reference resets inside workers,
            # util/subproc_vec_env.py:17-20)
            fresh = jax.vmap(env.reset)(jax.random.split(k_reset, Bl))
            env_states = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape((Bl,) + (1,) * (old.ndim - 1)), new, old
                ),
                fresh,
                env_states,
            )
            return (env_states, key), Transition(obs_vec, action, logp, value, rew, done)

        (env_states, key), traj = jax.lax.scan(body, (env_states, key), None, length=T)
        last_obs = N.flatten_obs(jax.vmap(env.observe)(env_states))
        last_value = N.value_apply(params["vf"], last_obs)
        return env_states, key, traj, last_value

    def _gae(traj: Transition, last_value):
        def body(carry, t):
            gae, next_value = carry
            nonterm = 1.0 - t.done.astype(jnp.float32)
            delta = t.reward + cfg.gamma * next_value * nonterm - t.value
            gae = delta + cfg.gamma * cfg.lam * nonterm * gae
            return (gae, t.value), gae

        (_, _), adv = jax.lax.scan(
            body, (jnp.zeros_like(last_value), last_value), traj, reverse=True
        )
        return adv, adv + traj.value

    def _loss(params, batch, adv, ret):
        mean, log_std = N.policy_dist(params["pi"], batch.obs)
        logp = N.gaussian_logp(batch.action, mean, log_std)
        ratio = jnp.exp(logp - batch.logp)
        pg1 = ratio * adv
        pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))
        value = N.value_apply(params["vf"], batch.obs)
        v_clip = batch.value + jnp.clip(
            value - batch.value, -cfg.clip_eps, cfg.clip_eps
        )
        vf_loss = 0.5 * jnp.mean(
            jnp.maximum((value - ret) ** 2, (v_clip - ret) ** 2)
        )
        ent = N.gaussian_entropy(log_std)
        loss = pg_loss + cfg.vf_coef * vf_loss - cfg.ent_coef * ent
        return loss, {
            "pg_loss": pg_loss,
            "vf_loss": vf_loss,
            "entropy": ent,
            "approx_kl": jnp.mean(batch.logp - logp),
        }

    def _update(params, opt_state, traj, adv, ret, key, sync):
        n = adv.shape[0] * adv.shape[1]  # shard-local T*Bl
        flat = jax.tree.map(lambda x: x.reshape((n,) + x.shape[2:]), traj)
        adv = adv.reshape(n)
        ret = ret.reshape(n)
        if cfg.normalize_adv:
            m = sync(jnp.mean(adv))
            v = sync(jnp.mean((adv - m) ** 2))
            adv = (adv - m) * jax.lax.rsqrt(v + 1e-8)
        mb = n // cfg.num_minibatches

        def epoch(carry, k_ep):
            params, opt_state = carry
            perm = jax.random.permutation(k_ep, n)

            def minibatch(carry, idx):
                params, opt_state = carry
                take = lambda x: x[idx]
                batch = jax.tree.map(take, flat)
                (loss, aux), grads = jax.value_and_grad(_loss, has_aux=True)(
                    params, batch, take(adv), take(ret)
                )
                grads = jax.tree.map(sync, grads)  # ← the MPI-allreduce analogue
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), {**aux, "loss": loss}

            idxs = perm[: mb * cfg.num_minibatches].reshape(cfg.num_minibatches, mb)
            (params, opt_state), aux = jax.lax.scan(
                minibatch, (params, opt_state), idxs
            )
            return (params, opt_state), aux

        (params, opt_state), aux = jax.lax.scan(
            epoch, (params, opt_state), jax.random.split(key, cfg.epochs)
        )
        return params, opt_state, jax.tree.map(jnp.mean, aux)

    def _train_iter(state: PPOState, sync, fold=None) -> tuple[PPOState, dict]:
        key, k_roll, k_upd = jax.random.split(state.key, 3)
        if fold is not None:  # decorrelate rollout RNG across shards
            k_roll = fold(k_roll)
            k_upd = fold(k_upd)
        env_states, _, traj, last_value = _rollout(
            state.params, state.env_states, k_roll
        )
        adv, ret = _gae(traj, last_value)
        params, opt_state, aux = _update(
            state.params, state.opt_state, traj, adv, ret, k_upd, sync
        )
        metrics = {
            **aux,
            "reward_per_step": sync(jnp.mean(traj.reward)),
            "done_frac": sync(jnp.mean(traj.done.astype(jnp.float32))),
        }
        return (
            PPOState(params, opt_state, env_states, key, state.step + 1),
            metrics,
        )

    if mesh is None:
        train_iter = jax.jit(partial(_train_iter, sync=lambda x: x))
    else:
        from ..parallel.mesh import shard_map

        n_dev = mesh.shape[axis]
        assert B % n_dev == 0, (B, n_dev)

        def sync(x):
            return jax.lax.pmean(x, axis)

        def fold(k):
            return jax.random.fold_in(k, jax.lax.axis_index(axis))

        sharded = shard_map(
            partial(_train_iter, sync=sync, fold=fold),
            mesh=mesh,
            in_specs=(
                PPOState(
                    params=P(),            # replicated
                    opt_state=P(),
                    env_states=P(axis),    # env lanes sharded over the mesh
                    key=P(),
                    step=P(),
                ),
            ),
            out_specs=(
                PPOState(P(), P(), P(axis), P(), P()),
                P(),
            ),
        )
        train_iter = jax.jit(sharded)

    return init, train_iter
