#!/usr/bin/env python
"""RL training entry point — the reference's ``run.py`` analogue.

Reference usage (``README.md:95-122``)::

    python -m run --algo bc|ppo|sac|gail --env FurnitureBaxterBlockEnv ...
    mpirun -np 32 python -m run --algo gail --demo_path demos/Sawyer_...

Here the MPI launch disappears: data-parallelism is a device mesh inside one
process (``furniture_tpu/rl/ppo.py``). Metrics stream to stdout as JSON
lines and to ``<run_dir>/metrics.jsonl``; final eval results are written as
``<run_dir>/result.json`` for ``tools/collect_results.py``.
"""

from __future__ import annotations

import argparse
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import json
import os
import pickle
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--algo", choices=["bc", "ppo", "sac", "gail"], default="ppo")
    p.add_argument("--env", default="IKEACursor-v0")
    p.add_argument("--furniture_name", default="table_lack_0825")
    p.add_argument("--num_envs", type=int, default=256)
    p.add_argument("--rollout_len", type=int, default=64)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--epochs", type=int, default=100, help="bc epochs")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--demo_path", default=None, help="demo pickle glob (bc/gail)")
    p.add_argument("--run_dir", default="./runs/default")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel devices (0 = single-device)")
    p.add_argument("--platform", default=None, help="force jax platform")
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from furniture_tpu.api import get_env, _resolve_config
    from furniture_tpu import rl

    os.makedirs(args.run_dir, exist_ok=True)
    metrics_f = open(os.path.join(args.run_dir, "metrics.jsonl"), "a")

    def log(it, m):
        rec = {"iter": it, **{k: float(v) for k, v in m.items()}}
        print(json.dumps(rec), flush=True)
        metrics_f.write(json.dumps(rec) + "\n")

    config = _resolve_config({"furniture_name": args.furniture_name})
    env = get_env(args.env)(config)
    key = jax.random.PRNGKey(args.seed)

    mesh = None
    if args.mesh:
        from furniture_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh)

    t0 = time.time()
    if args.algo == "bc":
        import glob as _glob
        import numpy as np
        demos = [pickle.load(open(f, "rb"))
                 for f in sorted(_glob.glob(args.demo_path))]
        X, Y = rl.demos_to_dataset(demos)
        init, fit, predict = rl.make_bc(X.shape[-1], Y.shape[-1],
                                        rl.BCConfig(lr=args.lr))
        st = init(key)
        for ep in range(args.epochs):
            st, m = fit(st, X, Y)
            if ep % 10 == 0 or ep == args.epochs - 1:
                log(ep, m)
        final = {"final_mse": float(m["mse"])}
    elif args.algo in ("ppo", "gail"):
        cfg = rl.PPOConfig(num_envs=args.num_envs, rollout_len=args.rollout_len,
                           lr=args.lr)
        reward_fn = None
        disc_state = disc_update = None
        if args.algo == "gail":
            import glob as _glob
            demos = [pickle.load(open(f, "rb"))
                     for f in sorted(_glob.glob(args.demo_path))]
            X, Y = rl.demos_to_dataset(demos)
            g_init, disc_reward, disc_update, _ = rl.make_gail(
                env, cfg, rl.GAILConfig(), X, Y, mesh=mesh
            )
            disc_state, key = g_init(key)
            reward_fn = lambda o, a, r: disc_reward(disc_state.params)(o, a, r)
        init, train = rl.make_ppo(env, cfg, mesh=mesh, reward_fn=reward_fn)
        st = init(key)
        for it in range(args.iters):
            st, m = train(st)
            if disc_update is not None:
                # freshest on-policy batch for the discriminator
                obs = rl.flatten_obs(jax.vmap(env.observe)(st.env_states))
                import jax.numpy as jnp
                import numpy as _np
                acts = jnp.zeros((obs.shape[0], env.dof))
                disc_state, dm = disc_update(disc_state, obs, acts)
                m = {**m, **dm}
            log(it, m)
        final = {"reward_per_step": float(m["reward_per_step"])}
    else:  # sac
        init, train = rl.make_sac(env, rl.SACConfig(num_envs=args.num_envs,
                                                    lr=args.lr))
        st = init(key)
        for it in range(args.iters):
            st, m = train(st)
            if it % 10 == 0 or it == args.iters - 1:
                log(it, m)
        final = {"reward_per_step": float(m["reward_per_step"])}

    result = {
        "algo": args.algo,
        "env": args.env,
        "furniture_name": args.furniture_name,
        "seed": args.seed,
        "wall_s": time.time() - t0,
        **final,
    }
    with open(os.path.join(args.run_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"result": result}))


if __name__ == "__main__":
    main()
