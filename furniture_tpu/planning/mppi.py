"""MPPI (model-predictive path integral) planning over the batched env.

Design (SURVEY.md §7.7): planner state lives on device; a plan step samples
N action sequences around the current mean, rolls each out through the
jitted env step (``vmap`` over samples, ``lax.scan`` over the horizon),
softmax-weights the returns, and updates the mean. On a device mesh the
sample axis is sharded with ``shard_map``; the softmax normalizer and the
weighted mean reduce with ``psum`` over ICI (this is the TPU-native analogue
of the reference's MPI data-parallel training, ``util/mpi.py``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from .. import transforms as T
from ..parallel.mesh import shard_map


@dataclass(frozen=True)
class MPPIConfig:
    horizon: int = 16
    n_samples: int = 256
    temperature: float = 1.0
    sigma: float = 0.3
    gamma: float = 1.0  # discount on per-step cost


def assembly_cost(env):
    """Dense guidance cost for furniture assembly: distance + misalignment of
    the next subtask's recipe connector pair, minus progress bonus.

    Shaped after the alignment predicate the env checks
    (``env/furniture.py:1057-1153``): position distance, up-vector cosine.
    """
    m = env.model

    def cost(state) -> jax.Array:
        cpos, cquat = env._conn_world(state.parts)
        if m.n_conn == 0 or len(m.recipe_site1) == 0:
            return jnp.float32(0.0)
        rs1 = jnp.asarray(m.recipe_site1)
        rs2 = jnp.asarray(m.recipe_site2)
        # first recipe entry whose sites are not yet connected
        open_mask = ~(
            state.conn_connected[rs1] | state.conn_connected[rs2]
        )
        any_open = jnp.any(open_mask)
        i = jnp.argmax(open_mask)
        # one-hot contraction, not cpos[rs1[i]]: traced-index gathers lower
        # catastrophically on TPU when this runs batched every rollout step
        # (see transforms.mat_to_quat)
        oh = jax.nn.one_hot(i, len(m.recipe_site1), dtype=cpos.dtype)
        p1 = oh @ cpos[rs1]
        p2 = oh @ cpos[rs2]
        u1 = oh @ T.up_vector_from_quat(cquat[rs1])
        u2 = oh @ T.up_vector_from_quat(cquat[rs2])
        d = jnp.linalg.norm(p1 - p2)
        misalign = 1.0 - jnp.sum(u1 * u2)
        progress = -10.0 * state.num_connected.astype(jnp.float32)
        return jnp.where(any_open, d + 0.3 * misalign, 0.0) + progress

    return cost


def _make_rollout_costs(env, cfg: MPPIConfig, cost_fn, S: int):
    """Batched rollout-cost evaluator: (state, samples [S,H,dof]) -> [S].

    Routes through ``env.step_batch`` when the env exposes the batched step
    API (``has_batch_api``) — the sample axis IS the batch axis, so the
    whole-control-step Pallas megakernel carries the planner's inner loop
    (SURVEY.md §7.7: rollouts = vmap(step) over samples×horizon)."""
    batched = getattr(env, "has_batch_api", False)

    def rollout_costs(state, samples):
        states0 = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (S,) + x.shape), state
        )

        if batched:
            def body(carry, a):
                sts, total, disc = carry
                sts, _, rew, _, _ = env.step_batch(sts, a)
                total = total + disc * (jax.vmap(cost_fn)(sts) - rew)
                return (sts, total, disc * cfg.gamma), None
        else:
            def body(carry, a):
                sts, total, disc = carry
                sts, _, rew, _, _ = jax.vmap(env.step)(sts, a)
                total = total + disc * (jax.vmap(cost_fn)(sts) - rew)
                return (sts, total, disc * cfg.gamma), None

        (_, total, _), _ = jax.lax.scan(
            body,
            (states0, jnp.zeros(S, jnp.float32), jnp.float32(1.0)),
            jnp.swapaxes(samples, 0, 1),                     # scan over H
        )
        return total

    return rollout_costs


def make_mppi(env, cfg: MPPIConfig, cost_fn=None):
    """Single-device MPPI plan step: (state, mean[H,dof], key) -> (mean, info)."""
    cost_fn = cost_fn or assembly_cost(env)
    H, S, dof = cfg.horizon, cfg.n_samples, env.dof
    rollout_costs = _make_rollout_costs(env, cfg, cost_fn, S)

    def plan(state, mean, key):
        noise = jax.random.normal(key, (S, H, dof)) * cfg.sigma
        samples = jnp.clip(mean[None] + noise, -1.0, 1.0)
        costs = rollout_costs(state, samples)                # [S]
        w = jax.nn.softmax(-costs / cfg.temperature)
        new_mean = jnp.einsum("s,shd->hd", w, samples)
        info = {"best_cost": jnp.min(costs), "mean_cost": jnp.mean(costs)}
        return new_mean, info

    return plan


def make_sharded_mppi(env, cfg: MPPIConfig, mesh: Mesh, cost_fn=None, axis="env"):
    """MPPI with the sample axis sharded over ``mesh``; softmax statistics
    reduce with ``psum`` over the mesh axis (ICI on hardware).

    The per-device sample shard rolls out through the batched step path
    (``env.step_batch`` → the whole-control-step Pallas megakernel on TPU),
    so each chip runs its S/n_dev rollouts as one kernel-batched block."""
    cost_fn = cost_fn or assembly_cost(env)
    H, S, dof = cfg.horizon, cfg.n_samples, env.dof
    n_dev = mesh.devices.size
    assert S % n_dev == 0, f"n_samples {S} must divide over {n_dev} devices"
    rollout_costs = _make_rollout_costs(env, cfg, cost_fn, S // n_dev)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),   # state + mean replicated, noise sharded
        out_specs=(P(), P()),
    )
    def _plan_shard(state, mean, noise):
        samples = jnp.clip(mean[None] + noise, -1.0, 1.0)   # [S/n,H,dof]
        costs = rollout_costs(state, samples)
        # global softmax via psum-normalized exponentials
        local_min = jnp.min(costs)
        global_min = jax.lax.pmin(local_min, axis)
        e = jnp.exp(-(costs - global_min) / cfg.temperature)
        z = jax.lax.psum(jnp.sum(e), axis)
        w = e / z
        new_mean = jax.lax.psum(jnp.einsum("s,shd->hd", w, samples), axis)
        best = jax.lax.pmin(jnp.min(costs), axis)
        return new_mean, best

    def plan(state, mean, key):
        noise = jax.random.normal(key, (S, H, dof)) * cfg.sigma
        new_mean, best = _plan_shard(state, mean, noise)
        return new_mean, {"best_cost": best}

    return plan
