#!/usr/bin/env python
"""Batched scripted demonstration generation CLI
(reference ``python -m furniture.env.furniture_sawyer_gen`` entry point,
``furniture_sawyer_gen.py:734-748``) — but vmapped: all episodes in one
compiled rollout on the accelerator, persisted through the native
trajectory store.

Usage:
  python tools/generate_demos.py --furniture table_lack_0825 --n_demos 16 \\
      --batch 64 --out demos/table_lack.ftr
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--furniture", default="table_lack_0825")
    p.add_argument("--n_demos", type=int, default=8)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="native .ftr store path")
    args = p.parse_args()

    from furniture_tpu.config import EnvConfig
    from furniture_tpu.envs.sawyer_gen import FurnitureSawyerGenEnv

    env = FurnitureSawyerGenEnv(
        EnvConfig(
            agent_type="Sawyer",
            control_type="ik",
            furniture_name=args.furniture,
        )
    )
    demos, success_rate = env.generate_demos(
        args.n_demos, seed=args.seed, batch=args.batch, store_path=args.out
    )
    print(
        f"generated {len(demos)} demos "
        f"(success rate {success_rate:.1%} over batch {args.batch})"
        + (f" -> {args.out}" if args.out else "")
    )


if __name__ == "__main__":
    main()
