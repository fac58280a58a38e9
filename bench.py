#!/usr/bin/env python
"""Throughput + MPC benchmark on one TPU chip vs the reference's numbers.

Reference baselines (``docs/more_info.md:35``, BASELINE.md; Xeon 6154 +
2080 Ti, no rendering):
  Cursor 491 steps/s | Sawyer impedance 225 | Sawyer IK 44

Each env step does the same work per step as the reference's ``fps.py``
loop: 50 physics substeps with contact solving (plus x3 action-repeat IK
resolve for the IK mode), the connect state machine, and observation
assembly — but batched over thousands of environments per chip. The cursor
benchmark routes through the whole-control-step Pallas megakernel
(``physics/megakernel.py``) via ``CursorEnv.step_batch``.

MPC metrics (BASELINE.md "Targets"): solves/s for a 64-step-horizon MPPI
plan iteration on table_lack (256 sample rollouts × 64 env steps each,
megakernel-batched), and an iLQR plan on the differentiable physics.
Real-time at control_freq=10 means ≥10 solves/s.

Prints ONE JSON line (the headline cursor metric) on stdout; all other
metrics go to stderr as secondary diagnostics. Timings are medians over
``reps`` repetitions (the TPU tunnel has high run-to-run variance).
"""

import json
import statistics
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
    "baxter_impedance": 158.0,  # docs/more_info.md:35
    "baxter_ik": 28.0,          # docs/more_info.md:35
    # reference render-on rows (docs/more_info.md:36-39): Sawyer impedance
    # with low-quality 200x200 Unity frames = 65; Cursor 500x500 high = 42
    "sawyer_impedance_render200": 65.0,
    "cursor_render500": 42.0,
    # reference MPC baseline does not exist (the reference has no planner);
    # vs_baseline for MPC metrics is vs real-time at control_freq=10.
    "mppi": 10.0,
    "ilqr": 10.0,
}


def _sync(out):
    """Force real device synchronization.

    ``block_until_ready`` alone is not a reliable barrier on the tunneled
    TPU platform (calls can complete "ready" while execution is still
    queued); a scalar device→host transfer of a value data-dependent on the
    result is. Reduce one leaf and fetch it."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _all_times(fn, args, reps: int, evolve=None) -> list:
    """Wall times of ``fn(*args)`` over ``reps`` runs (post-warmup).

    ``evolve(args, out, i) -> args`` MUST make each repetition's inputs
    distinct — the TPU tunnel memoizes identical (executable, inputs) calls,
    so re-timing the same call measures the cache, not the chip."""
    out = fn(*args)
    _sync(out)
    ts = []
    for i in range(reps):
        args = evolve(args, out, i) if evolve else args
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return ts


def _median_time(fn, args, reps: int, evolve=None) -> float:
    return statistics.median(_all_times(fn, args, reps, evolve))


def throughput(env, batch: int, horizon: int = 10, reps: int = 5) -> float:
    batched = getattr(env, "has_batch_api", False)
    step = env.step_batch if batched else jax.vmap(env.step)
    reset = env.reset_batch if batched else jax.vmap(env.reset)

    @jax.jit
    def rollout(states, key):
        def body(carry, _):
            states, key = carry
            key, k_act = jax.random.split(key)
            actions = jax.random.uniform(
                k_act, (batch, env.dof), minval=-1.0, maxval=1.0
            )
            states, obs, rew, done, info = step(states, actions)
            return (states, key), rew

        (states, _), rews = jax.lax.scan(body, (states, key), None, length=horizon)
        return states, rews.sum()

    key = jax.random.PRNGKey(0)
    states = jax.jit(reset)(jax.random.split(key, batch))
    dt = _median_time(
        rollout,
        (states, key),
        reps,
        # feed the rolled-out states back in; fresh key per rep
        evolve=lambda args, out, i: (out[0], jax.random.fold_in(args[1], i)),
    )
    return batch * horizon / dt


def render_throughput(
    env, batch: int, width: int = 200, height: int = 200,
    horizon: int = 5, reps: int = 3,
) -> float:
    """Env steps/s with a per-step camera render (the reference's
    render-on FPS rows, ``docs/more_info.md:36-39``: Unity ships a frame
    every step; here the raycast renderer draws on-device)."""
    from furniture_tpu.render import frontview, make_render_fn

    cam = frontview(width, height)
    render = make_render_fn(env, cam)
    batched = getattr(env, "has_batch_api", False)
    step = env.step_batch if batched else jax.vmap(env.step)
    reset = env.reset_batch if batched else jax.vmap(env.reset)

    @jax.jit
    def rollout(states, key):
        def body(carry, _):
            states, key = carry
            key, k_act = jax.random.split(key)
            actions = jax.random.uniform(
                k_act, (batch, env.dof), minval=-1.0, maxval=1.0
            )
            states, obs, rew, done, info = step(states, actions)
            rgb, depth, seg = jax.vmap(render)(states)
            return (states, key), rgb.astype(jnp.float32).mean()

        (states, _), frames = jax.lax.scan(
            body, (states, key), None, length=horizon
        )
        return states, frames.sum()

    key = jax.random.PRNGKey(0)
    states = jax.jit(reset)(jax.random.split(key, batch))
    dt = _median_time(
        rollout,
        (states, key),
        reps,
        evolve=lambda args, out, i: (out[0], jax.random.fold_in(args[1], i)),
    )
    return batch * horizon / dt


def bench_mppi(reps: int = 10) -> tuple:
    """MPPI plan-iterations/s: 64-step horizon, 256 sample rollouts on
    table_lack (BASELINE.md: "64-step MPC on table_lack"). One solve = one
    full plan iteration = 16384 megakernel env steps + weight update.

    The planner rolls out a coarsened internal model (5 physics substeps
    of dt=0.02 per control step instead of 50 of dt=0.002, 8 solver iters
    — the standard MPC practice of planning on a cheaper model than the
    one you execute on; ``bench_ilqr`` uses the same substep coarsening).

    Measured round 5: median ~9.3-10 solves/s with min ~8 across 10 reps —
    the solve is glue-latency-bound per sequential control step (the same
    cursor pre-physics documented in docs/perf_cursor.md), so the
    remaining real-time margin comes from folding that glue into the
    megakernel, not from the planner."""
    from furniture_tpu.planning import MPPIConfig, make_mppi
    from furniture_tpu.config import SimConfig

    env = CursorEnv(
        EnvConfig(
            furniture_name="table_lack_0825",
            sim=SimConfig(timestep=0.02, solver_iters=8),
        )
    )
    cfg = MPPIConfig(horizon=64, n_samples=256, sigma=0.3)
    plan = jax.jit(make_mppi(env, cfg))
    state = env.reset(jax.random.PRNGKey(0))
    mean = jnp.zeros((cfg.horizon, env.dof))
    ts = _all_times(
        plan,
        (state, mean, jax.random.PRNGKey(1)),
        reps,
        # receding-horizon realism: warm-start from the previous plan's mean
        evolve=lambda args, out, i: (args[0], out[0], jax.random.fold_in(args[2], i)),
    )
    # median AND worst-rep rates: the tunnel has high run-to-run variance
    # (see _all_times), so the real-time claim needs a variance bound
    return 1.0 / statistics.median(ts), 1.0 / max(ts)


def bench_ilqr(reps: int = 3) -> float:
    """iLQR solves/s: 64-step horizon on the differentiable cursor physics
    (10 substeps per planner step — the standard coarsened planning model —
    5 Newton iterations, 5-point parallel line search). One solve = a full
    ``plan`` call.

    The planned problem is real manipulation: cursor 0 holds part 0 (so
    B = ∂f/∂u ≠ 0 through the rigid-group co-move) and the cost drives the
    held part to a pose target 18 cm away; ``tests/test_ilqr.py`` asserts
    the same setup beats the zero-control rollout."""
    from furniture_tpu.planning import (
        ILQRConfig,
        flatten_env_dynamics,
        make_ilqr,
    )
    from furniture_tpu.config import SimConfig

    # the same planner-model coarsening bench_mppi uses: 8 solver iters
    # (plus the 10-substep coarsening passed to flatten_env_dynamics below)
    env = CursorEnv(
        EnvConfig(
            furniture_name="table_lack_0825",
            sim=SimConfig(solver_iters=8),
        )
    )
    state = env.reset(jax.random.PRNGKey(0))
    state = state._replace(
        cursor_pos=state.cursor_pos.at[0].set(state.parts.pos[0]),
        selected=state.selected.at[0].set(0),
    )
    f, x0, unravel = flatten_env_dynamics(env, state, substeps=10)
    target = unravel(x0)["pos"][0] + jnp.array([0.12, 0.1, 0.08])

    def running_cost(x, u, t):
        c = unravel(x)
        return 10.0 * jnp.sum((c["pos"][0] - target) ** 2) + 0.05 * jnp.sum(
            u**2
        )

    def terminal_cost(x):
        c = unravel(x)
        return 100.0 * jnp.sum((c["pos"][0] - target) ** 2)

    # parallel-in-time Riccati: O(log H)-depth associative scan instead of
    # a 64-long sequential backward scan (identical gains,
    # tests/test_ilqr.py); profile: runs/profile_ilqr.json,
    # docs/perf_planning.md. (A surrogate line search was measured SLOWER
    # here: vmapped candidate width is free on this backend, extra
    # sequential depth is not.)
    cfg = ILQRConfig(horizon=64, iterations=5, parallel_riccati=True)
    plan = jax.jit(make_ilqr(f, running_cost, terminal_cost, cfg))
    u0 = jnp.zeros((cfg.horizon, env.dof))
    dt = _median_time(
        plan,
        (x0, u0),
        reps,
        evolve=lambda args, out, i: (args[0] + 1e-4 * (i + 1), out[0]),
    )
    return 1.0 / dt


def emit(name: str, value: float, unit: str, baseline: float, out=sys.stderr):
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(value, 1),
                "unit": unit,
                "vs_baseline": round(value / baseline, 2),
            }
        ),
        file=out,
        flush=True,
    )


def main():
    results = {}

    def attempt(name, fn):
        try:
            results[name] = fn()
        except Exception as e:  # one failed metric must not kill the bench
            print(
                json.dumps({"metric": name, "error": repr(e)[:200]}),
                file=sys.stderr, flush=True,
            )

    env = CursorEnv(EnvConfig(furniture_name="table_lack_0825"))
    results["cursor"] = throughput(env, batch=4096, horizon=20)

    attempt("sawyer_impedance", lambda: throughput(
        ArmEnv(EnvConfig(agent_type="Sawyer", control_type="impedance")),
        batch=512, reps=3))
    attempt("sawyer_ik", lambda: throughput(
        ArmEnv(EnvConfig(agent_type="Sawyer", control_type="ik")),
        batch=256, reps=3))
    attempt("baxter_impedance", lambda: throughput(
        ArmEnv(EnvConfig(agent_type="Baxter", control_type="impedance")),
        batch=256, reps=3))
    attempt("baxter_ik", lambda: throughput(
        ArmEnv(EnvConfig(agent_type="Baxter", control_type="ik")),
        batch=128, reps=3))
    attempt("sawyer_impedance_render200", lambda: render_throughput(
        ArmEnv(EnvConfig(agent_type="Sawyer", control_type="impedance")),
        batch=128, width=200, height=200, reps=3))
    attempt("cursor_render500", lambda: render_throughput(
        CursorEnv(EnvConfig(furniture_name="table_lack_0825")),
        batch=32, width=500, height=500, reps=3))

    attempt("mppi", bench_mppi)
    attempt("ilqr", bench_ilqr)

    for name in (
        "sawyer_impedance",
        "sawyer_ik",
        "baxter_impedance",
        "baxter_ik",
        "sawyer_impedance_render200",
        "cursor_render500",
    ):
        if name in results:
            emit(
                f"{name}_env_steps_per_s_per_chip",
                results[name],
                "env_steps/s",
                BASELINES[name],
            )
    if "mppi" in results:
        med, worst = results["mppi"]
        emit(
            "mppi_mpc_solves_per_s_h64_s256", med, "solves/s",
            BASELINES["mppi"],
        )
        emit(
            "mppi_mpc_solves_per_s_h64_s256_min", worst, "solves/s",
            BASELINES["mppi"],
        )
    if "ilqr" in results:
        emit(
            "ilqr_mpc_solves_per_s_h64", results["ilqr"], "solves/s",
            BASELINES["ilqr"],
        )

    emit(
        "cursor_env_steps_per_s_per_chip",
        results["cursor"],
        "env_steps/s",
        BASELINES["cursor"],
        out=sys.stdout,
    )


if __name__ == "__main__":
    main()
