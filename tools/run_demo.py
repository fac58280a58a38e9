#!/usr/bin/env python
"""Demo playback — the reference's ``demo_demonstration.py`` +
``run_demo``/``run_demo_actions`` (``env/furniture.py:2183-2234,2581-2624``).

Replays a recorded demo pickle through the environment open-loop (action
replay, the implicit determinism test of SURVEY.md §4) and reports the
cumulative reward, connections, and — when the demo carries recorded
states — the trajectory divergence. Optionally encodes a video of the
replay through the on-device renderer.

    python tools/run_demo.py demos/Cursor_manual_0000.pkl --env IKEACursor-v0
"""

from __future__ import annotations

import argparse
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("demo")
    p.add_argument("--env", default="IKEACursor-v0")
    p.add_argument("--furniture_name", default="table_lack_0825")
    p.add_argument("--control_type", default="ik")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--video", default=None, help="output video path (.mp4)")
    p.add_argument("--screen_width", type=int, default=256)
    p.add_argument("--screen_height", type=int, default=256)
    p.add_argument("--platform", default="cpu")
    p.add_argument(
        "--state_replay", action="store_true",
        help="replay the recorded states stream (reference run_demo, "
        "env/furniture.py:2183) instead of stepping recorded actions",
    )
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", args.platform)
    import jax
    jax.config.update("jax_platforms", args.platform)

    from furniture_tpu import make_env
    from furniture_tpu.utils.demo import load_demo

    demo = load_demo(args.demo)
    actions = demo["actions"]
    env = make_env(args.env, furniture_name=args.furniture_name,
                   control_type=args.control_type,
                   screen_width=args.screen_width,
                   screen_height=args.screen_height)
    env.reset(seed=args.seed)

    states_rec = demo.get("states") or []
    if args.state_replay:
        # reference state-based playback: drive the env through the
        # recorded state stream frame by frame (env/furniture.py:2183)
        if not states_rec or "parts_pos" not in states_rec[0]:
            raise SystemExit("demo carries no replayable states stream")
        vid = None
        if args.video:
            from furniture_tpu.utils.video_recorder import VideoRecorder

            vid = VideoRecorder(args.video)
        st = env.get_env_state()
        for t, snap in enumerate(states_rec):
            st = env.env.restore_snapshot(st, snap)
            env.set_env_state(st)
            if vid:
                vid.capture_frame(
                    (env.render("rgb_array") * 255).astype(np.uint8)
                )
        if vid:
            vid.close()
            print(f"video -> {args.video}")
        print(json.dumps({
            "steps": len(states_rec),
            "num_connected": int(states_rec[-1]["num_connected"]),
            "mode": "state_replay",
        }))
        return

    vid = None
    if args.video:
        from furniture_tpu.utils.video_recorder import VideoRecorder

        vid = VideoRecorder(args.video)
        vid.capture_frame((env.render("rgb_array") * 255).astype(np.uint8))

    total_rew, n_conn = 0.0, 0
    for t, a in enumerate(actions):
        ob, rew, done, info = env.step(np.asarray(a, np.float32))
        total_rew += rew
        n_conn = int(info.get("num_connected", n_conn))
        if vid:
            vid.capture_frame((env.render("rgb_array") * 255).astype(np.uint8))
        if done:
            break
    if vid:
        vid.close()
        print(f"video -> {args.video}")

    result = {"steps": t + 1, "total_reward": total_rew, "num_connected": n_conn}
    # trajectory divergence vs recorded observations, when present
    obs_rec = demo.get("obs") or []
    if obs_rec and isinstance(obs_rec[-1], dict) and "object_ob" in obs_rec[-1]:
        ref = np.asarray(obs_rec[min(t + 1, len(obs_rec) - 1)]["object_ob"]).ravel()
        cur = np.asarray(ob["object_ob"]).ravel()
        if ref.shape == cur.shape:
            result["final_object_ob_l2"] = float(np.linalg.norm(ref - cur))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
