#!/usr/bin/env python
"""Cursor megakernel throughput decomposition (the committed profiling
artifact SURVEY §5 / VERDICT r3 item 3 ask for).

Measures, at the bench configuration (batch 4096, 20-step rollouts):
  full        - CursorEnv.step_batch rollout (the bench number)
  kernel      - the 50-substep megakernel alone (same scan shape)
  kernel1     - a 1-substep megakernel call (the snap-back settle cost)
  glue        - step_batch with physics replaced by identity (pre/post
                physics + transpose/pad glue + connect machinery)
Writes runs/profile_cursor.json and prints the breakdown.
"""

from __future__ import annotations

import json
import statistics
import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from furniture_tpu.config import EnvConfig
from furniture_tpu.envs.cursor import CursorEnv


def _sync(out):
    """Real device barrier: ``block_until_ready`` is not reliable on the
    tunneled TPU platform (see bench.py) — fetch a data-dependent scalar."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def median_time(fn, args, reps=5, evolve=None):
    out = fn(*args)
    _sync(out)
    ts = []
    for i in range(reps):
        args = evolve(args, out, i) if evolve else args
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), out


def main():
    B, H = 4096, 20
    env = CursorEnv(EnvConfig(furniture_name="table_lack_0825"))
    key = jax.random.PRNGKey(0)
    states = jax.jit(env.reset_batch)(jax.random.split(key, B))
    n_sub = env.config.n_substeps

    def rollout_with(step):
        @jax.jit
        def rollout(states, key):
            def body(carry, _):
                states, key = carry
                key, k = jax.random.split(key)
                a = jax.random.uniform(k, (B, env.dof), minval=-1, maxval=1)
                states, obs, rew, done, info = step(states, a)
                return (states, key), rew
            (states, _), rews = jax.lax.scan(body, (states, key), None, length=H)
            return states, rews.sum()
        return rollout

    results = {}

    # full
    dt, _ = median_time(
        rollout_with(env.step_batch), (states, key), reps=5,
        evolve=lambda args, out, i: (out[0], jax.random.fold_in(args[1], i)),
    )
    results["full_steps_per_s"] = B * H / dt
    results["full_ms_per_batchstep"] = 1e3 * dt / H

    # kernel only (50-substep megakernel in the same scan shape)
    sub = env._batched_substeps
    parts0 = states.parts
    group = states.group
    gscale = jnp.ones_like(group, jnp.float32)

    @jax.jit
    def kernel_roll(parts):
        def body(p, _):
            return sub(p, group, gscale, n_sub), None
        parts, _ = jax.lax.scan(body, parts, None, length=H)
        return parts

    dt, _ = median_time(
        kernel_roll, (parts0,), reps=5,
        evolve=lambda args, out, i: (out,),
    )
    results["kernel_steps_per_s"] = B * H / dt
    results["kernel_ms_per_batchstep"] = 1e3 * dt / H

    # 1-substep kernel (snap-back settle cost)
    @jax.jit
    def kernel1_roll(parts):
        def body(p, _):
            return sub(p, group, gscale, 1), None
        parts, _ = jax.lax.scan(body, parts, None, length=H)
        return parts

    dt, _ = median_time(
        kernel1_roll, (parts0,), reps=5, evolve=lambda args, out, i: (out,),
    )
    results["kernel1_ms_per_batchstep"] = 1e3 * dt / H

    # glue: step_batch with the physics swapped for identity
    real = env._batched_substeps
    env._batched_substeps = lambda parts, group, gscale, n: parts
    dt, _ = median_time(
        rollout_with(env.step_batch), (states, key), reps=5,
        evolve=lambda args, out, i: (out[0], jax.random.fold_in(args[1], i)),
    )
    env._batched_substeps = real
    results["glue_steps_per_s"] = B * H / dt
    results["glue_ms_per_batchstep"] = 1e3 * dt / H

    results["batch"] = B
    results["horizon"] = H
    results["block"] = env.config.sim.mega_block
    results["n_substeps"] = n_sub
    results["solver_iters"] = env.config.sim.solver_iters
    print(json.dumps(results, indent=2))
    with open("runs/profile_cursor.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
