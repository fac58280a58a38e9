#!/usr/bin/env python
"""FPS benchmark harness (reference ``furniture/fps.py:39-223``).

Single-config mode measures steps/s of random-action rollouts for one
(agent, control_type, furniture) combination; ``--all`` sweeps the
reference's agent/control matrix (its render sweeps don't apply — rendering
is out of the physics engine's scope). Unlike the reference's single-env
loop, throughput here is batched: pass ``--batch`` to set envs-per-chip.

Usage:
  python tools/fps.py --agent Sawyer --control ik --furniture table_lack_0825
  python tools/fps.py --all
"""

from __future__ import annotations

import argparse
import json
import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def measure(agent, control, furniture, batch, horizon=10, reps=3):
    from furniture_tpu.config import EnvConfig
    from furniture_tpu.envs.arm import ArmEnv
    from furniture_tpu.envs.cursor import CursorEnv

    cfg = EnvConfig(
        agent_type=agent, control_type=control, furniture_name=furniture
    )
    env = CursorEnv(cfg) if agent == "Cursor" else ArmEnv(cfg)
    # the megakernel-backed batch path when the env provides one (on TPU
    # this is the production path the megakernels exist for; the vmapped
    # per-env step is launch-bound and ~10-50x slower)
    batched = getattr(env, "has_batch_api", False)
    step = env.step_batch if batched else jax.vmap(env.step)
    reset = env.reset_batch if batched else jax.vmap(env.reset)

    @jax.jit
    def rollout(states, key):
        def body(carry, _):
            states, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(
                k, (batch, env.dof), minval=-1.0, maxval=1.0
            )
            states, obs, rew, done, info = step(states, a)
            return (states, key), rew

        (states, _), rews = jax.lax.scan(
            body, (states, key), None, length=horizon
        )
        return states, rews.sum()

    key = jax.random.PRNGKey(0)
    states = jax.jit(reset)(jax.random.split(key, batch))
    out, _ = rollout(states, key)
    jax.tree.map(jax.block_until_ready, out)
    t0 = time.perf_counter()
    for i in range(reps):
        out, _ = rollout(out, jax.random.fold_in(key, i))
    jax.tree.map(jax.block_until_ready, out)
    dt = time.perf_counter() - t0
    return batch * horizon * reps / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--agent", default="Cursor")
    p.add_argument("--control", default="ik")
    p.add_argument("--furniture", default="table_lack_0825")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--all", action="store_true")
    args = p.parse_args()

    if args.all:
        # the reference's fps.py test_all agent/control matrix (fps.py:133-223)
        combos = [
            ("Cursor", "ik"),
            ("Sawyer", "ik"),
            ("Sawyer", "impedance"),
            ("Baxter", "ik"),
            ("Baxter", "impedance"),
        ]
        for agent, control in combos:
            fps = measure(agent, control, args.furniture, args.batch)
            print(
                json.dumps(
                    {
                        "agent": agent,
                        "control": control,
                        "furniture": args.furniture,
                        "batch": args.batch,
                        "steps_per_s": round(fps, 1),
                    }
                )
            )
    else:
        fps = measure(args.agent, args.control, args.furniture, args.batch)
        print(
            json.dumps(
                {
                    "agent": args.agent,
                    "control": args.control,
                    "furniture": args.furniture,
                    "batch": args.batch,
                    "steps_per_s": round(fps, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
