#!/usr/bin/env python
"""iLQR solve-time decomposition on real TPU (VERDICT round-4 ask: say
where the remaining cost is before optimizing further).

Measures, for the exact bench.py configuration (h=64, 5 Newton iterations,
5-alpha parallel line search, 10-substep planning model):
* one full plan() solve
* one closed-loop line-search sweep (5 alphas × 64-step rollout)
* one linearization pass (vmap(jacrev) over the horizon, smooth surrogate)
* one Riccati backward pass
* a single 64-step open-loop rollout

Writes runs/profile_ilqr.json; the narrative lives in docs/perf_planning.md.
"""

from __future__ import annotations

import json
import statistics
import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def med(fn, args, reps=5, evolve=None):
    out = fn(*args)
    _sync(out)
    ts = []
    for i in range(reps):
        if evolve:
            args = evolve(args, i)
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    from bench import bench_ilqr  # noqa: F401  (same config constants)
    from furniture_tpu.config import EnvConfig, SimConfig
    from furniture_tpu.envs.cursor import CursorEnv
    from furniture_tpu.planning import (
        ILQRConfig,
        flatten_env_dynamics,
        make_ilqr,
    )
    from furniture_tpu.planning.ilqr import make_ilqr as _mk

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

    cfg = ILQRConfig(horizon=64, iterations=5)
    H, m, n = cfg.horizon, env.dof, x0.shape[0]
    u0 = jnp.zeros((H, m))

    out = {"horizon": H, "iterations": cfg.iterations,
           "n_alphas": len(cfg.alphas), "n_state": int(n), "n_ctrl": int(m)}

    plan = jax.jit(make_ilqr(f, running_cost, terminal_cost, cfg))
    out["full_solve_s"] = med(
        plan, (x0, u0), reps=3,
        evolve=lambda a, i: (a[0] + 1e-4 * (i + 1), a[1]),
    )

    # single open-loop rollout (full contact physics)
    @jax.jit
    def rollout(x0_, us):
        def body(x, u):
            xn = f(x, u)
            return xn, xn

        _, xs = jax.lax.scan(body, x0_, us)
        return xs

    out["rollout64_s"] = med(
        rollout, (x0, u0), reps=5,
        evolve=lambda a, i: (a[0] + 1e-4 * (i + 1), a[1]),
    )

    # 5-alpha closed-loop sweep (dominant per-iteration piece)
    @jax.jit
    def ls_sweep(x0_, xs_ref, us_ref, ks, Ks):
        def fwd(alpha):
            def body(carry, inp):
                x, acc, t = carry
                x_ref, u_ref, k, Kt = inp
                u = jnp.clip(
                    u_ref + alpha * k + Kt @ (x - x_ref), -1.0, 1.0
                )
                acc = acc + running_cost(x, u, t)
                return (f(x, u), acc, t + 1), u

            (xl, acc, _), us = jax.lax.scan(
                body, (x0_, 0.0, 0), (xs_ref[:-1], us_ref, ks, Ks)
            )
            return acc + terminal_cost(xl)

        return jax.vmap(fwd)(jnp.asarray(cfg.alphas))

    xs_ref = jnp.concatenate([x0[None], rollout(x0, u0)], axis=0)
    ks = jnp.zeros((H, m))
    Ks = jnp.zeros((H, m, n))
    out["linesearch5_s"] = med(
        ls_sweep, (x0, xs_ref, u0, ks, Ks), reps=5,
        evolve=lambda a, i: (a[0] + 1e-4 * (i + 1),) + a[1:],
    )

    # linearization pass (smooth-surrogate jacrev over the horizon)
    @jax.jit
    def lin(xs, us):
        J = jax.vmap(
            lambda x, u: jax.jacrev(
                lambda z: f(z[:n], z[n:])
            )(jnp.concatenate([x, u]))
        )(xs[:-1], us)
        return J

    out["linearize_s"] = med(
        lin, (xs_ref, u0), reps=5,
        evolve=lambda a, i: (a[0] + 1e-4 * (i + 1), a[1]),
    )

    # Riccati backward pass on representative shapes
    from furniture_tpu.planning.ilqr import ILQRConfig as _C

    A = jnp.tile(jnp.eye(n)[None], (H, 1, 1))
    B = 0.01 * jnp.ones((H, n, m))
    cx = jnp.ones((H, n))
    cu = jnp.ones((H, m))
    cxx = jnp.tile(jnp.eye(n)[None], (H, 1, 1))
    cuu = jnp.tile(jnp.eye(m)[None], (H, 1, 1))
    cux = jnp.zeros((H, m, n))
    vx = jnp.ones(n)
    vxx = jnp.eye(n)

    planner = make_ilqr(f, running_cost, terminal_cost, cfg)
    # rebuild the backward fn exactly as make_ilqr does (sequential scan)
    import furniture_tpu.planning.ilqr as M

    @jax.jit
    def backward(A_, B_):
        def body(carry, inp):
            Vx, Vxx = carry
            At, Bt, cxt, cut, cxxt, cuut, cuxt = inp
            Qx = cxt + At.T @ Vx
            Qu = cut + Bt.T @ Vx
            Qxx = cxxt + At.T @ Vxx @ At
            Quu = cuut + Bt.T @ Vxx @ Bt
            Qux = cuxt + Bt.T @ Vxx @ At
            Quu_reg = Quu + 1e-3 * jnp.eye(m)
            L = jnp.linalg.cholesky(
                0.5 * (Quu_reg + Quu_reg.T) + 1e-9 * jnp.eye(m)
            )
            k = -jax.scipy.linalg.cho_solve((L, True), Qu)
            Kt = -jax.scipy.linalg.cho_solve((L, True), Qux)
            Vx_new = Qx + Kt.T @ Quu @ k + Kt.T @ Qu + Qux.T @ k
            Vxx_new = Qxx + Kt.T @ Quu @ Kt + Kt.T @ Qux + Qux.T @ Kt
            return (Vx_new, 0.5 * (Vxx_new + Vxx_new.T)), (k, Kt)

        (_, _), (ks_, Ks_) = jax.lax.scan(
            body, (vx, vxx), (A_, B_, cx, cu, cxx, cuu, cux), reverse=True
        )
        return ks_, Ks_

    out["backward_s"] = med(
        backward, (A, B), reps=5,
        evolve=lambda a, i: (a[0] + 1e-6 * (i + 1), a[1]),
    )

    # accounting: iterations × (linearize + backward + linesearch)
    out["accounted_s"] = cfg.iterations * (
        out["linearize_s"] + out["backward_s"] + out["linesearch5_s"]
    ) + out["rollout64_s"]
    out["solves_per_s"] = 1.0 / out["full_solve_s"]
    print(json.dumps(out, indent=2))
    with open("runs/profile_ilqr.json", "w") as fo:
        json.dump(out, fo, indent=2)


if __name__ == "__main__":
    main()
