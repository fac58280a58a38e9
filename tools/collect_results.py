#!/usr/bin/env python
"""Aggregate training/eval results across runs — the reference's
``collect_results.py:1-32`` (which scans ``log/*/eval/*.hdf5`` for success
rates and phase stats) rebuilt over the JSON results that
``tools/train_rl.py`` writes.

Usage::

    python tools/collect_results.py runs/            # scan all result.json
"""

from __future__ import annotations

import argparse
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import glob
import json
import os
from collections import defaultdict

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("root", nargs="?", default="./runs")
    args = p.parse_args()

    groups = defaultdict(list)
    for path in sorted(glob.glob(os.path.join(args.root, "**", "result.json"),
                                 recursive=True)):
        with open(path) as f:
            r = json.load(f)
        groups[(r.get("algo"), r.get("env"), r.get("furniture_name"))].append(r)

    if not groups:
        print(f"no result.json under {args.root}")
        return

    for (algo, env, furn), rs in sorted(groups.items()):
        metrics = defaultdict(list)
        for r in rs:
            for k, v in r.items():
                if isinstance(v, (int, float)) and k != "seed":
                    metrics[k].append(v)
        line = {
            "algo": algo, "env": env, "furniture": furn, "runs": len(rs),
            **{
                k: {"mean": float(np.mean(v)), "std": float(np.std(v))}
                for k, v in metrics.items()
            },
        }
        print(json.dumps(line))


if __name__ == "__main__":
    main()
