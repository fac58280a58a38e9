#!/usr/bin/env python
"""Throughput benchmark: batched cursor-env rollout steps/s on one TPU chip.

Reference baseline: 491 env steps/s — Cursor agent, table_lack_0825, no
rendering, on a Xeon Gold 6154 (``docs/more_info.md:35``, BASELINE.md).
Each env step includes 50 physics substeps with contact solving, the connect
state machine, and observation assembly — identical work per step to the
reference's ``fps.py`` loop (500 random-action steps).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

from furniture_tpu.config import EnvConfig
from furniture_tpu.envs.cursor import CursorEnv

BASELINE_STEPS_PER_S = 491.0  # docs/more_info.md:35 (Cursor, no render)


def main(batch: int = 2048, horizon: int = 20):
    env = CursorEnv(EnvConfig(furniture_name="table_lack_0825"))

    @jax.jit
    def rollout(states, key):
        def body(carry, _):
            states, key = carry
            key, k_act = jax.random.split(key)
            actions = jax.random.uniform(
                k_act, (batch, env.dof), minval=-1.0, maxval=1.0
            )
            states, obs, rew, done, info = jax.vmap(env.step)(states, actions)
            return (states, key), rew

        (states, _), rews = jax.lax.scan(body, (states, key), None, length=horizon)
        return states, rews.sum()

    key = jax.random.PRNGKey(0)
    states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, batch))

    # warmup / compile
    out, _ = rollout(states, key)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        out, s = rollout(out, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    steps_per_s = batch * horizon * reps / dt
    print(
        json.dumps(
            {
                "metric": "cursor_env_steps_per_s_per_chip",
                "value": round(steps_per_s, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
