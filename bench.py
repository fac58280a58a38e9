#!/usr/bin/env python
"""Throughput benchmark on one TPU chip vs the reference's published numbers.

Reference baselines (``docs/more_info.md:35``, BASELINE.md; Xeon 6154 +
2080 Ti, no rendering):
  Cursor 491 steps/s | Sawyer impedance 225 | Sawyer IK 44

Each env step does the same work per step as the reference's ``fps.py``
loop: 50 physics substeps with contact solving (plus x3 action-repeat IK
resolve for the IK mode), the connect state machine, and observation
assembly — but batched over thousands of environments per chip.

Prints ONE JSON line (the headline cursor metric) on stdout; the arm-agent
numbers go to stderr as secondary diagnostics.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from furniture_tpu.config import EnvConfig
from furniture_tpu.envs.arm import ArmEnv
from furniture_tpu.envs.cursor import CursorEnv

BASELINES = {
    "cursor": 491.0,           # docs/more_info.md:35 (Cursor, no render)
    "sawyer_impedance": 225.0,  # docs/more_info.md:35
    "sawyer_ik": 44.0,          # docs/more_info.md:35
}


def throughput(env, batch: int, horizon: int = 10, reps: int = 3) -> float:
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
    out, _ = rollout(states, key)  # warmup / compile
    jax.tree.map(jax.block_until_ready, out)

    t0 = time.perf_counter()
    for i in range(reps):
        out, s = rollout(out, jax.random.fold_in(key, i))
    jax.tree.map(jax.block_until_ready, out)
    dt = time.perf_counter() - t0
    return batch * horizon * reps / dt


def main():
    results = {}

    env = CursorEnv(EnvConfig(furniture_name="table_lack_0825"))
    results["cursor"] = throughput(env, batch=2048, horizon=20)

    env = ArmEnv(
        EnvConfig(agent_type="Sawyer", control_type="impedance")
    )
    results["sawyer_impedance"] = throughput(env, batch=512)

    env = ArmEnv(EnvConfig(agent_type="Sawyer", control_type="ik"))
    results["sawyer_ik"] = throughput(env, batch=256)

    for name in ("sawyer_impedance", "sawyer_ik"):
        print(
            json.dumps(
                {
                    "metric": f"{name}_env_steps_per_s_per_chip",
                    "value": round(results[name], 1),
                    "unit": "env_steps/s",
                    "vs_baseline": round(results[name] / BASELINES[name], 2),
                }
            ),
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "cursor_env_steps_per_s_per_chip",
                "value": round(results["cursor"], 1),
                "unit": "env_steps/s",
                "vs_baseline": round(results["cursor"] / BASELINES["cursor"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
