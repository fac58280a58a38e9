#!/usr/bin/env python
"""Batched scripted demonstration generation CLI
(reference ``python -m furniture.env.furniture_sawyer_gen`` entry point,
``furniture_sawyer_gen.py:734-748``) — but vmapped: all episodes in one
compiled rollout on the accelerator, saved as reference-schema demo pickles
(``util/demo_recorder.py:33-87``) that ``rl/bc.py`` and ``rl/gail.py``
consume directly, plus a success-rate stats JSON.

Usage:
  python tools/generate_demos.py --furniture table_lack_0825 --n_demos 4 \\
      --batch 128 --demo_dir demos/ --stats_out runs/gen_stats.json
"""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--furniture", default="table_lack_0825")
    p.add_argument("--n_demos", type=int, default=8)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--out", default=None, help="native .ftr store path")
    p.add_argument("--demo_dir", default=None,
                   help="directory for reference-schema demo pickles")
    p.add_argument("--stats_out", default=None,
                   help="write the success-rate stats JSON here")
    p.add_argument("--no_obs", action="store_true",
                   help="skip per-step observation recording (smaller demos)")
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
    demos, stats = env.generate_demos(
        args.n_demos,
        seed=args.seed,
        batch=args.batch,
        store_path=args.out,
        demo_dir=args.demo_dir,
        max_steps=args.max_steps,
        record_obs=not args.no_obs,
    )
    stats["furniture_name"] = args.furniture
    stats["n_demos_saved"] = len(demos)
    print(json.dumps(stats))
    if args.stats_out:
        with open(args.stats_out, "w") as f:
            json.dump(stats, f, indent=2)


if __name__ == "__main__":
    main()
