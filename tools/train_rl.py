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
    p.add_argument("--ckpt_every", type=int, default=50,
                   help="checkpoint interval in train iters (0 = off)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the newest checkpoint in run_dir")
    p.add_argument("--eval_episodes", type=int, default=64,
                   help="final success-rate eval episodes (0 = skip)")
    p.add_argument("--eval_max_steps", type=int, default=200)
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from furniture_tpu.api import get_env, _resolve_config
    from furniture_tpu import rl
    from furniture_tpu.utils.checkpoint import (
        checkpoint_step,
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

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

    def maybe_resume(st):
        """Restore the newest run_dir checkpoint into ``st`` (same
        structure) and return (state, start_iter)."""
        if not args.resume:
            return st, 0
        path = latest_checkpoint(args.run_dir)
        if path is None:
            return st, 0
        print(json.dumps({"resumed_from": path}), flush=True)
        return load_checkpoint(path, st), checkpoint_step(path) + 1

    def maybe_ckpt(st, it, last=False):
        if args.ckpt_every and (last or (it + 1) % args.ckpt_every == 0):
            save_checkpoint(args.run_dir, st, it)

    t0 = time.time()
    eval_fn = None
    if args.algo == "bc":
        import glob as _glob
        import numpy as np
        demos = [pickle.load(open(f, "rb"))
                 for f in sorted(_glob.glob(args.demo_path))]
        X, Y = rl.demos_to_dataset(demos)
        init, fit, predict = rl.make_bc(X.shape[-1], Y.shape[-1],
                                        rl.BCConfig(lr=args.lr))
        st, start = maybe_resume(init(key))
        m = None
        for ep in range(start, args.epochs):
            st, m = fit(st, X, Y)
            if ep % 10 == 0 or ep == args.epochs - 1:
                log(ep, m)
            maybe_ckpt(st, ep, last=ep == args.epochs - 1)
        final = {"final_mse": float(m["mse"])} if m is not None else {}
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
        if args.algo == "gail":
            # the discriminator is part of the run state: resuming the
            # policy alone would restart disc_state from random init and
            # corrupt the adversarial reward relative to an uninterrupted
            # run, so (policy, disc) checkpoint as one pytree
            bundle, start = maybe_resume({"policy": st, "disc": disc_state})
            st, disc_state = bundle["policy"], bundle["disc"]
        else:
            st, start = maybe_resume(st)
        m = None
        for it in range(start, args.iters):
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
            maybe_ckpt(
                {"policy": st, "disc": disc_state}
                if args.algo == "gail" else st,
                it, last=it == args.iters - 1,
            )
        final = (
            {"reward_per_step": float(m["reward_per_step"])}
            if m is not None else {}
        )
        if args.eval_episodes:
            eval_fn = rl.make_evaluate(
                env, rl.ppo_act, args.eval_episodes, args.eval_max_steps
            )
    else:  # sac
        init, train = rl.make_sac(env, rl.SACConfig(num_envs=args.num_envs,
                                                    lr=args.lr))
        st, start = maybe_resume(init(key))
        m = None
        for it in range(start, args.iters):
            st, m = train(st)
            if it % 10 == 0 or it == args.iters - 1:
                log(it, m)
            maybe_ckpt(st, it, last=it == args.iters - 1)
        final = (
            {"reward_per_step": float(m["reward_per_step"])}
            if m is not None else {}
        )
        if args.eval_episodes:
            eval_fn = rl.make_evaluate(
                env, rl.sac_act, args.eval_episodes, args.eval_max_steps
            )

    # final success-rate eval (reference eval HDF5 → collect_results.py:10-32)
    if eval_fn is not None:
        em = eval_fn(st.params, jax.random.PRNGKey(args.seed + 1))
        final.update({k: float(v) for k, v in em.items()})
        log("eval", em)

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
