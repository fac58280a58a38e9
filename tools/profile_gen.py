#!/usr/bin/env python
"""Failure attribution for the scripted demo generator.

The round-4 artifact (``runs/gen_stats_table_lack_b256.json``) showed 57% of
episodes ending with ZERO connects. This tool attributes those failures the
same way ``tools/profile_cursor.py`` attributed milliseconds: roll a batch of
scripted episodes recording the per-step generator phase / grasp state /
connect count per lane, then aggregate per-cohort statistics host-side:

* phase occupancy (where do zero-connect lanes spend their steps?)
* grasp funnel: attempts (entries into Z_MOVE_G), acquisitions (exits into
  MOVE_WAYPOINTS), drops (regrasp resets), per lane
* align funnel: entries into ALIGN_CONN vs entries into Z_MOVE_CONN_FINE
* connect-attempt funnel: steps with the connect action high vs connects
* part-batted-away detection: final xy distance of the current subtask's leg
  from the workspace center

Writes ``runs/profile_gen.json``; summary prose lives in
``docs/perf_gen.md``. Reference behavior bar: the generator is the
reference's demo factory (``furniture_sawyer_gen.py:347-731``).

Usage: python tools/profile_gen.py --batch 128 --max_steps 2400
"""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import numpy as np


def rollout_diag(env, batch: int, max_steps: int, seed: int):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    k_reset, k_gen = jax.random.split(key)
    reset = jax.jit(env.reset_batch)
    init_pol = jax.jit(jax.vmap(env.init_policy_state))

    st_leg = jnp.asarray(env._st["leg"])

    def one_step(carry, _):
        env_s, gen_s = carry
        action, gen_s = jax.vmap(env.scripted_action)(gen_s, env_s)

        def lane_diag(g, e, a):
            leg = st_leg[jnp.minimum(g.part, env.n_subtasks - 1)]
            held = e.touch_l[0, leg] & e.touch_r[0, leg]
            leg_xy = jnp.linalg.norm(e.parts.pos[leg][:2])
            leg_speed = jnp.linalg.norm(e.parts.lin_vel[leg])
            return (
                g.phase.astype(jnp.int8),
                held,
                g.drop_count.astype(jnp.int8),
                leg_xy.astype(jnp.float32),
                (a[7] > 0.0),
                leg_speed.astype(jnp.float32),
            )

        diag = jax.vmap(lane_diag)(gen_s, env_s, action)
        env_s, obs, rew, done, info = env.step_batch(env_s, action)
        rec = diag + (
            env_s.num_connected.astype(jnp.int8),
            env_s.subtask_step.astype(jnp.int8),
        )
        return (env_s, gen_s), rec

    seg = 400

    @jax.jit
    def rollout_seg(env_s, gen_s):
        (env_s, gen_s), traj = jax.lax.scan(
            one_step, (env_s, gen_s), None, length=seg
        )
        return env_s, gen_s, traj

    env_s = reset(jax.random.split(k_reset, batch))
    gen_s = init_pol(env_s, jax.random.split(k_gen, batch))
    chunks = []
    n_seg = int(np.ceil(max_steps / seg))
    for i in range(n_seg):
        env_s, gen_s, traj = rollout_seg(env_s, gen_s)
        chunks.append(jax.tree.map(np.asarray, traj))
        print(f"  segment {i + 1}/{n_seg}", file=_sys.stderr, flush=True)
    return jax.tree.map(lambda *xs: np.concatenate(xs)[:max_steps], *chunks)


PHASES = [
    "INIT_GRIP", "XY_MOVE_G", "ALIGN_G", "Z_MOVE_G", "MOVE_WAYPOINTS",
    "ALIGN_CONN", "XY_MOVE_CONN", "Z_MOVE_CONN", "ALIGN_CONN_FINE",
    "Z_MOVE_CONN_FINE", "MOVE_NOGRIP_SAFEPOS", "PART_DONE",
]


def analyze(traj, n_subtasks: int):
    (phase, held, drop_count, leg_xy, conn_act, leg_speed,
     n_conn, subtask) = traj
    T_, B = phase.shape
    final_conn = n_conn[-1]

    out = {"batch": int(B), "max_steps": int(T_)}
    out["connect_histogram"] = np.bincount(
        final_conn, minlength=n_subtasks + 1
    ).tolist()
    out["success_rate"] = float((final_conn >= n_subtasks).mean())

    # phase transitions per lane
    prev = phase[:-1]
    cur = phase[1:]
    changed = prev != cur

    def entries(p):
        """Per-lane count of transitions into phase p."""
        return ((cur == p) & changed).sum(0)

    grasp_attempts = entries(3)          # Z_MOVE_G
    grasp_success = entries(4)           # MOVE_WAYPOINTS (only entered on grasp)
    align_entries = entries(5)           # ALIGN_CONN
    fine_entries = entries(9)            # Z_MOVE_CONN_FINE
    # regrasp resets: INIT_GRIP entries after step 0
    regrasps = entries(0)

    cohorts = {}
    for c in range(n_subtasks + 1):
        m = final_conn == c
        if not m.any():
            continue
        occ = np.stack(
            [(phase[:, m] == p).mean() for p in range(12)]
        )
        cohorts[f"connects_{c}"] = {
            "n_lanes": int(m.sum()),
            "phase_occupancy": {
                PHASES[p]: round(float(occ[p]), 4) for p in range(12)
                if occ[p] > 0.001
            },
            "mean_grasp_attempts": round(float(grasp_attempts[m].mean()), 2),
            "mean_grasp_successes": round(float(grasp_success[m].mean()), 2),
            "mean_regrasps": round(float(regrasps[m].mean()), 2),
            "mean_align_entries": round(float(align_entries[m].mean()), 2),
            "mean_fine_entries": round(float(fine_entries[m].mean()), 2),
            "ever_held_frac": round(float(held[:, m].any(0).mean()), 3),
            "held_frac_of_steps": round(float(held[:, m].mean()), 3),
            "mean_connect_act_steps": round(float(conn_act[:, m].sum(0).mean()), 1),
            "final_leg_xy_p50": round(float(np.median(leg_xy[-1, m])), 3),
            "final_leg_xy_p90": round(
                float(np.percentile(leg_xy[-1, m], 90)), 3
            ),
            "leg_off_workspace_frac": round(
                float((leg_xy[-1, m] > 0.6).mean()), 3
            ),
            "final_subtask_hist": np.bincount(
                subtask[-1, m], minlength=n_subtasks + 1
            ).tolist(),
        }
    out["cohorts"] = cohorts

    # ejection events: the phase at which each lane's leg hit its peak
    # speed (legs found meters off-workspace imply violent ejections)
    t_peak = leg_speed.argmax(0)                                  # [B]
    peak_v = leg_speed.max(0)
    peak_phase = phase[t_peak, np.arange(B)]
    out["ejection"] = {
        "peak_speed_p50": round(float(np.median(peak_v)), 2),
        "peak_speed_p90": round(float(np.percentile(peak_v, 90)), 2),
        "peak_phase_hist": {
            PHASES[p]: int((peak_phase == p).sum())
            for p in range(12)
            if (peak_phase == p).any()
        },
        "frac_steps_speed_gt_2": round(float((leg_speed > 2.0).mean()), 4),
    }

    # the funnel over ALL lanes: where does the pipeline leak?
    out["funnel"] = {
        "lanes": int(B),
        "ever_grasped": int(held.any(0).sum()),
        "ever_entered_align_conn": int((align_entries > 0).sum()),
        "ever_entered_fine": int((fine_entries > 0).sum()),
        "ever_pressed_connect": int(conn_act.any(0).sum()),
        "got_first_connect": int((final_conn >= 1).sum()),
        "got_all_connects": int((final_conn >= n_subtasks).sum()),
    }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--furniture", default="table_lack_0825")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--max_steps", type=int, default=2400)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--solver_iters", type=int, default=None)
    p.add_argument("--out", default="runs/profile_gen.json")
    args = p.parse_args()

    from furniture_tpu.config import EnvConfig, SimConfig
    from furniture_tpu.envs.sawyer_gen import FurnitureSawyerGenEnv

    sim = SimConfig() if args.solver_iters is None else SimConfig(
        solver_iters=args.solver_iters
    )
    env = FurnitureSawyerGenEnv(
        EnvConfig(
            agent_type="Sawyer",
            control_type="ik",
            furniture_name=args.furniture,
            sim=sim,
        )
    )
    traj = rollout_diag(env, args.batch, args.max_steps, args.seed)
    out = analyze(traj, env.n_subtasks)
    out["furniture_name"] = args.furniture
    out["seed"] = args.seed
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
