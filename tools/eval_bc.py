#!/usr/bin/env python
"""Close the demo → IL → eval loop: train BC on generated demos, evaluate
the policy's batched env success rate, commit the metrics artifact.

The reference ships demo generation + BC/GAIL training entry points
(``README.md:95-122``) but no in-repo trainer; this tool runs the whole
loop natively: reference-schema demo pickles → ``rl.bc`` behavioral
cloning → ``n_episodes`` batched env rollouts of the deterministic policy
(megakernel batch path) scoring the reference's success criterion.

Usage:
  python tools/eval_bc.py --demos 'demos/generated*/*.pkl' \\
      --num_connects 1 --episodes 32 --steps 400 \\
      --out runs/bc_eval.json
"""

from __future__ import annotations

import argparse
import glob
import json
import pickle
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--demos", default="demos/generated*/*.pkl")
    p.add_argument("--furniture", default="table_lack_0825")
    p.add_argument("--num_connects", type=int, default=1,
                   help="success bar for eval (1 = first subtask)")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--episodes", type=int, default=32)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--pool_offset", type=int, default=0,
        help="when >0, evaluate from an init-state pool harvested this many "
        "steps before each demo's success (the reference's "
        "--load_init_states curriculum loop, env/furniture.py:127-130) "
        "instead of from scratch resets",
    )
    p.add_argument("--out", default="runs/bc_eval.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from furniture_tpu import rl
    from furniture_tpu.config import EnvConfig
    from furniture_tpu.envs.sawyer_dense import FurnitureSawyerDenseRewardEnv
    from furniture_tpu.rl import networks as N

    files = sorted(glob.glob(args.demos))
    if not files:
        raise SystemExit(f"no demos match {args.demos}")
    demos = [pickle.load(open(f, "rb")) for f in files]
    X, Y = rl.demos_to_dataset(demos)
    print(f"dataset: {X.shape[0]} transitions from {len(files)} demos",
          file=_sys.stderr)

    init, fit, predict = rl.make_bc(X.shape[-1], Y.shape[-1])
    st = init(jax.random.PRNGKey(args.seed))
    for e in range(args.epochs):
        st, m = fit(st, X, Y)
        if e % 50 == 0 or e == args.epochs - 1:
            print(f"epoch {e}: mse {float(m['mse']):.5f}", file=_sys.stderr)

    env = FurnitureSawyerDenseRewardEnv(
        EnvConfig(
            agent_type="Sawyer",
            control_type="ik",
            furniture_name=args.furniture,
            num_connects=args.num_connects,
        )
    )

    if args.pool_offset > 0:
        snaps = []
        for d in demos:
            sts = d.get("states") or []
            if len(sts) > args.pool_offset:
                s0 = sts[len(sts) - 1 - args.pool_offset]
                snaps.append({
                    "pos": np.asarray(s0["parts_pos"]),
                    "quat": np.asarray(s0["parts_quat"]),
                    "group": np.asarray(s0["group"]),
                    "weld_active": np.asarray(s0["weld_active"]),
                    "conn_connected": np.asarray(s0["conn_connected"]),
                    "num_connected": np.asarray(s0["num_connected"]),
                    "qpos": np.asarray(s0["qpos"]),
                    "qvel": np.zeros_like(np.asarray(s0["qvel"])),
                })
        from furniture_tpu.utils.init_pool import stack_pool

        env.set_init_state_pool(stack_pool(snaps))
        print(f"init pool: {len(snaps)} near-success states",
              file=_sys.stderr)

    B = args.episodes
    key = jax.random.PRNGKey(args.seed + 1)
    states = jax.jit(env.reset_batch)(jax.random.split(key, B))
    params = st.params

    # success criterion: with pool restores the state already carries
    # connects and the dense subtask bookkeeping restarts, so score an
    # ADDITIONAL connect; from-scratch eval scores the env's own success
    nconn0 = states.num_connected

    def seg(states, succeeded, succ_t, t0, n):
        def body(carry, t):
            states, succeeded, succ_t = carry
            obs = jax.vmap(env.observe)(states)
            obs_vec = N.flatten_obs(obs)
            action = jax.vmap(lambda o: N.policy_dist(params, o)[0])(obs_vec)
            states, _, rew, done, info = env.step_batch(states, action)
            if args.pool_offset > 0:
                success = states.num_connected > nconn0
            else:
                success = info["success"].astype(bool)
            newly = success & ~succeeded
            succ_t = jnp.where(newly, t + 1, succ_t)
            succeeded = succeeded | success
            return (states, succeeded, succ_t), None

        (states, succeeded, succ_t), _ = jax.lax.scan(
            body, (states, succeeded, succ_t), t0 + jnp.arange(n)
        )
        return states, succeeded, succ_t

    seg_j = jax.jit(seg, static_argnums=(4,))
    succeeded = jnp.zeros(B, bool)
    succ_t = jnp.full(B, args.steps, jnp.int32)
    chunk = 200
    for t0 in range(0, args.steps, chunk):
        n = min(chunk, args.steps - t0)
        states, succeeded, succ_t = seg_j(
            states, succeeded, succ_t, jnp.int32(t0), n
        )
        print(f"  t={t0 + n}: successes {int(succeeded.sum())}/{B}",
              file=_sys.stderr, flush=True)

    out = {
        "n_demos": len(files),
        "n_transitions": int(X.shape[0]),
        "bc_final_mse": float(m["mse"]),
        "episodes": B,
        "max_steps": args.steps,
        "num_connects": args.num_connects,
        "success_rate": float(jnp.mean(succeeded.astype(jnp.float32))),
        "n_success": int(succeeded.sum()),
        "success_steps": sorted(
            int(t) for t in np.asarray(succ_t)[np.asarray(succeeded)]
        ),
        "pool_offset": args.pool_offset,
        "criterion": (
            "additional_connect" if args.pool_offset > 0 else "env_success"
        ),
        "furniture_name": args.furniture,
        "seed": args.seed,
    }
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
