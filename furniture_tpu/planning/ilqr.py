"""iLQR / DDP trajectory optimization over the jitted dynamics.

Completes the planning engine of SURVEY.md §7.7 alongside the sampling
planners (MPPI/CEM): linearize the batched step with ``jax.jacrev``, run the
Riccati backward pass over the horizon, forward-roll with a parallel line
search. Everything is jit-compiled; the per-timestep linearizations
(``vmap(jacrev)`` over the horizon) are batched matmul work that maps onto
the MXU, which is where this planner spends its FLOPs on TPU.

Design notes:
* dynamics are a *flattened-vector* step ``x' = f(x, u)`` — callers adapt an
  environment via ``flatten_env_dynamics`` which freezes the discrete
  bookkeeping (groups, weld masks) and differentiates only the continuous
  physics (poses, velocities, joint state). Contact impulses are
  differentiated through the unrolled Jacobi iterations (smooth except on
  the friction-cone boundary — standard practice for contact iLQR).
* the backward pass has two implementations: a sequential ``lax.scan`` and a
  parallel-in-time associative-scan Riccati (``ILQRConfig.parallel_riccati``,
  after Särkkä & García-Fernández, IEEE TAC 2023) whose O(log H)-depth
  combines XLA lowers onto ICI collectives when the horizon axis is sharded
  over a mesh — the SURVEY §7.7 "context parallelism" analogue. Both produce
  identical gains (tests/test_ilqr.py).
* the line search evaluates all candidate step sizes in parallel
  (``vmap`` over alphas) and keeps the best — branch-free control flow.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree


@dataclass(frozen=True)
class ILQRConfig:
    horizon: int = 16
    iterations: int = 10
    reg_init: float = 1e-3
    reg_max: float = 1e3
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03)
    u_min: float = -1.0
    u_max: float = 1.0
    # parallel-in-time Riccati backward pass (associative scan over the
    # horizon, O(log H) depth) instead of the sequential lax.scan — the
    # SURVEY §7.7 "context parallelism" analogue: with the horizon axis
    # sharded over a mesh, XLA lowers the scan's combines onto ICI
    # collectives.
    parallel_riccati: bool = False


def riccati_elements(A, B, cx, cu, cxx, cuu, cux, vx, vxx, reg):
    """Per-step conditional-value elements for the parallel LQR scan.

    Parameterization after Särkkä & García-Fernández, "Temporal
    Parallelization of Dynamic Programming and Linear Quadratic Control"
    (IEEE TAC 2023): element (A, b, C, η, J) represents the value function
    of a time interval as V(x) = ½ xᵀJx − ηᵀx after elimination of the
    interior; cross terms c_ux are removed by the standard change of control
    variables first. Returns arrays of length H+1 (terminal element last).
    """
    H, n, m = B.shape
    Im = jnp.eye(m)
    U = cuu + reg * Im[None]
    Ui = jnp.linalg.solve(U, jnp.broadcast_to(Im, (H, m, m)))
    BUi = B @ Ui
    F = A - BUi @ cux
    b = -(BUi @ cu[..., None])[..., 0]
    C = BUi @ jnp.swapaxes(B, 1, 2)
    X = cxx - jnp.swapaxes(cux, 1, 2) @ Ui @ cux
    cxb = cx - (jnp.swapaxes(cux, 1, 2) @ Ui @ cu[..., None])[..., 0]
    zmat = jnp.zeros((1, n, n))
    zvec = jnp.zeros((1, n))
    return (
        jnp.concatenate([F, zmat]),
        jnp.concatenate([b, zvec]),
        jnp.concatenate([C, zmat]),
        jnp.concatenate([-cxb, -vx[None]]),
        jnp.concatenate([X, vxx[None]]),
    )


def riccati_combine(e_earlier, e_later):
    """Associative combination of two conditional-value elements (the
    earlier-in-time interval first)."""
    Ai, bi, Ci, etai, Ji = e_earlier
    Aj, bj, Cj, etaj, Jj = e_later
    n = Ai.shape[-1]
    I = jnp.broadcast_to(jnp.eye(n), Ai.shape)
    M = jnp.linalg.solve(
        jnp.swapaxes(I + Ci @ Jj, -1, -2), jnp.swapaxes(Aj, -1, -2)
    )
    AjM = jnp.swapaxes(M, -1, -2)                       # A_j (I + C_i J_j)^{-1}
    A_out = AjM @ Ai
    b_out = (AjM @ (bi + (Ci @ etaj[..., None])[..., 0])[..., None])[..., 0] + bj
    C_out = AjM @ Ci @ jnp.swapaxes(Aj, -1, -2) + Cj
    JjM = Jj @ jnp.linalg.solve(I + Ci @ Jj, I)         # (I+J_jC_i)^{-1}J_j
    eta_out = (
        jnp.swapaxes(Ai, -1, -2)
        @ (etaj - (JjM @ (bi + (Ci @ etaj[..., None])[..., 0])[..., None])[..., 0])[
            ..., None
        ]
    )[..., 0] + etai
    J_out = jnp.swapaxes(Ai, -1, -2) @ JjM @ Ai + Ji
    return A_out, b_out, C_out, eta_out, J_out


def make_ilqr(f, running_cost, terminal_cost, cfg: ILQRConfig, f_surrogate=None):
    """Build a jittable iLQR solve.

    f:             (x [n], u [m]) -> x' [n]
    running_cost:  (x, u, t) -> scalar
    terminal_cost: (x) -> scalar
    f_surrogate:   optional cheap dynamics twin (e.g. the contact-free
                   surrogate of ``flatten_env_dynamics``). When given, the
                   parallel line search RANKS its candidates on the
                   surrogate and re-rolls only the winning step size on the
                   full dynamics (whose cost gates acceptance) — a
                   trust-region-style surrogate line search that replaces
                   len(alphas) full-physics rollouts per iteration with
                   len(alphas) cheap ones + 1 full one.

    Returns ``plan(x0, u_init [H,m]) -> (u*, info)``.
    """
    H = cfg.horizon

    def rollout(x0, us):
        def body(x, u):
            xn = f(x, u)
            return xn, xn

        _, xs = jax.lax.scan(body, x0, us)
        return jnp.concatenate([x0[None], xs], axis=0)          # [H+1,n]

    def total_cost(x0, us):
        xs = rollout(x0, us)
        ts = jnp.arange(H)
        cs = jax.vmap(running_cost)(xs[:-1], us, ts)
        return jnp.sum(cs) + terminal_cost(xs[-1])

    def linearize(xs, us):
        """Per-step dynamics/cost expansions, batched over the horizon.

        A and B come from ONE jacrev over the concatenated (x,u) input: the
        n output VJP pulls are shared between them (two separate jacrev
        calls would re-run every pull twice)."""
        ts = jnp.arange(H)
        n = xs.shape[-1]
        J = jax.vmap(
            lambda x, u: jax.jacrev(
                lambda z: f(z[:n], z[n:])
            )(jnp.concatenate([x, u]))
        )(xs[:-1], us)                                          # [H,n,n+m]
        A = J[:, :, :n]
        B = J[:, :, n:]

        def cost_grads(x, u, t):
            cx = jax.grad(running_cost, argnums=0)(x, u, t)
            cu = jax.grad(running_cost, argnums=1)(x, u, t)
            cxx = jax.hessian(running_cost, argnums=0)(x, u, t)
            cuu = jax.hessian(running_cost, argnums=1)(x, u, t)
            cux = jax.jacrev(
                jax.grad(running_cost, argnums=1), argnums=0
            )(x, u, t)
            return cx, cu, cxx, cuu, cux

        cx, cu, cxx, cuu, cux = jax.vmap(cost_grads)(xs[:-1], us, ts)
        vx = jax.grad(terminal_cost)(xs[-1])
        vxx = jax.hessian(terminal_cost)(xs[-1])
        return A, B, cx, cu, cxx, cuu, cux, vx, vxx

    def backward(A, B, cx, cu, cxx, cuu, cux, vx, vxx, reg):
        """Riccati backward pass (lax.scan over reversed time)."""
        m = B.shape[-1]

        def body(carry, inp):
            Vx, Vxx = carry
            At, Bt, cxt, cut, cxxt, cuut, cuxt = inp
            Qx = cxt + At.T @ Vx
            Qu = cut + Bt.T @ Vx
            Qxx = cxxt + At.T @ Vxx @ At
            Quu = cuut + Bt.T @ Vxx @ Bt
            Qux = cuxt + Bt.T @ Vxx @ At
            Quu_reg = Quu + reg * jnp.eye(m)
            L = jnp.linalg.cholesky(
                0.5 * (Quu_reg + Quu_reg.T) + 1e-9 * jnp.eye(m)
            )
            k = -jax.scipy.linalg.cho_solve((L, True), Qu)
            Kt = -jax.scipy.linalg.cho_solve((L, True), Qux)
            Vx_new = Qx + Kt.T @ Quu @ k + Kt.T @ Qu + Qux.T @ k
            Vxx_new = Qxx + Kt.T @ Quu @ Kt + Kt.T @ Qux + Qux.T @ Kt
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            dv = k @ Qu + 0.5 * k @ Quu @ k
            return (Vx_new, Vxx_new), (k, Kt, dv)

        (_, _), (ks, Ks, dvs) = jax.lax.scan(
            body,
            (vx, vxx),
            (A, B, cx, cu, cxx, cuu, cux),
            reverse=True,
        )
        return ks, Ks, jnp.sum(dvs)

    def backward_parallel(A, B, cx, cu, cxx, cuu, cux, vx, vxx, reg):
        """Parallel-in-time Riccati: suffix-combine the conditional-value
        elements with ``jax.lax.associative_scan`` (O(log H) depth), then
        recover all per-step gains in one vmapped batch. Matches
        ``backward`` to solver tolerance (tests/test_ilqr.py)."""
        m = B.shape[-1]
        elems = riccati_elements(A, B, cx, cu, cxx, cuu, cux, vx, vxx, reg)
        # reverse scan combines with the LATER interval as the left operand
        suffix = jax.lax.associative_scan(
            lambda a, b: riccati_combine(b, a), elems, reverse=True
        )
        Vxx_next = suffix[4][1:]                         # [H,n,n] V at t+1
        vx_next = -suffix[3][1:]                         # [H,n]

        def gains(At, Bt, cut, cuut, cuxt, Vxxn, vxn):
            Quu = cuut + Bt.T @ Vxxn @ Bt
            Qu = cut + Bt.T @ vxn
            Qux = cuxt + Bt.T @ Vxxn @ At
            Quu_reg = Quu + reg * jnp.eye(m)
            L = jnp.linalg.cholesky(
                0.5 * (Quu_reg + Quu_reg.T) + 1e-9 * jnp.eye(m)
            )
            k = -jax.scipy.linalg.cho_solve((L, True), Qu)
            Kt = -jax.scipy.linalg.cho_solve((L, True), Qux)
            dv = k @ Qu + 0.5 * k @ Quu @ k
            return k, Kt, dv

        ks, Ks, dvs = jax.vmap(gains)(A, B, cu, cuu, cux, Vxx_next, vx_next)
        return ks, Ks, jnp.sum(dvs)

    backward_fn = backward_parallel if cfg.parallel_riccati else backward

    def make_forward(f_dyn):
        def forward(x0, xs_ref, us_ref, ks, Ks, alpha):
            """Closed-loop rollout with the new gains at step size alpha.

            Returns (us, cost): the rollout already visits every state, so
            the candidate's cost accumulates in the same scan — re-rolling
            the dynamics in a separate total_cost would double the line
            search's dominant expense."""

            def body(carry, inp):
                x, acc, t = carry
                x_ref, u_ref, k, Kt = inp
                u = u_ref + alpha * k + Kt @ (x - x_ref)
                u = jnp.clip(u, cfg.u_min, cfg.u_max)
                acc = acc + running_cost(x, u, t)
                return (f_dyn(x, u), acc, t + 1), (u, x)

            (x_last, acc, _), (us, xs) = jax.lax.scan(
                body,
                (x0, jnp.float32(0.0), jnp.int32(0)),
                (xs_ref[:-1], us_ref, ks, Ks),
            )
            xs_full = jnp.concatenate([xs, x_last[None]], axis=0)  # [H+1,n]
            return us, acc + terminal_cost(x_last), xs_full

        return forward

    forward = make_forward(f)
    forward_sur = make_forward(f_surrogate) if f_surrogate is not None else None

    def plan(x0, u_init):
        def iteration(carry, _):
            us, xs, reg, cost = carry
            exp = linearize(xs, us)
            ks, Ks, _ = backward_fn(*exp, reg)

            if forward_sur is not None:
                # rank candidates on the cheap surrogate, then roll only
                # the winner on the full dynamics (which gates acceptance)
                _, sur_costs, _ = jax.vmap(
                    lambda a: forward_sur(x0, xs, us, ks, Ks, a)
                )(jnp.asarray(cfg.alphas))
                best = jnp.argmin(sur_costs)
                alpha_b = jnp.asarray(cfg.alphas)[best]
                best_us, best_cost, best_xs = forward(
                    x0, xs, us, ks, Ks, alpha_b
                )
            else:
                # each candidate's rollout already produces its state
                # sequence; the accepted candidate's xs carries to the next
                # iteration's linearization (no separate re-rollout)
                cand_us, cand_costs, cand_xs = jax.vmap(
                    lambda a: forward(x0, xs, us, ks, Ks, a)
                )(jnp.asarray(cfg.alphas))
                best = jnp.argmin(cand_costs)
                oh = jax.nn.one_hot(best, len(cfg.alphas), dtype=us.dtype)
                best_us = jnp.einsum("a,ahm->hm", oh, cand_us)
                best_xs = jnp.einsum("a,ahn->hn", oh, cand_xs)
                best_cost = cand_costs[best]
            improved = best_cost < cost
            us_new = jnp.where(improved, best_us, us)
            xs_new = jnp.where(improved, best_xs, xs)
            cost_new = jnp.minimum(best_cost, cost)
            reg_new = jnp.clip(
                jnp.where(improved, reg * 0.5, reg * 10.0),
                cfg.reg_init,
                cfg.reg_max,
            )
            return (us_new, xs_new, reg_new, cost_new), cost_new

        # one rollout serves both the initial trajectory and its cost — a
        # separate total_cost would double the sequential rollout depth,
        # which is what the solve time is made of on this backend
        xs0 = rollout(x0, u_init)
        cost0 = jnp.sum(
            jax.vmap(running_cost)(xs0[:-1], u_init, jnp.arange(H))
        ) + terminal_cost(xs0[-1])
        (us, _, _, cost), hist = jax.lax.scan(
            iteration,
            (u_init, xs0, jnp.float32(cfg.reg_init), cost0),
            None,
            length=cfg.iterations,
        )
        return us, {"cost": cost, "cost0": cost0, "history": hist}

    return plan


def flatten_env_dynamics(
    env,
    template_state,
    substeps: int | None = None,
    smooth_grads: bool = True,
):
    """Adapt an env to flat-vector dynamics for iLQR.

    Differentiates the *continuous* physics only: the returned ``f`` maps the
    flattened continuous leaves (part poses + joint state) through
    ``n_substeps`` of the env's physics with the discrete bookkeeping (rigid
    groups, weld masks, counters) frozen at ``template_state``'s values —
    the standard smooth-dynamics surrogate for contact-rich trajectory
    optimization.

    Cursor dynamics zero part velocities at every control step (reference
    ``env/furniture.py:2857-2887``), so velocities are NOT part of the flat
    state — keeping them would add 30 zero-derivative outputs to every
    ``jacrev`` pull in the linearizer.

    ``smooth_grads=True`` (cursor env) installs a gradient surrogate via
    ``jax.custom_vjp``: the primal runs the full contact physics, while the
    backward pass differentiates the SAME step with the contact-impulse
    solver disabled (``solver_iters=0``). Pullback cost drops by the whole
    solver loop; the planner keeps exact trajectories/costs and smooth
    free-flight + held-group steering derivatives — the standard
    smooth-model trick for contact iLQR (the impulse derivative it drops is
    piecewise constant and noisy through unrolled Jacobi anyway).

    Returns (f, x0, unravel): ``f(x, u) -> x'``, the initial flat state, and
    the pytree unravel function.
    """
    from .. import transforms as T
    from ..envs.cursor import CursorEnv

    cont = {
        "pos": template_state.parts.pos,
        "quat": template_state.parts.quat,
    }
    has_robot = hasattr(template_state, "qpos")
    if has_robot:
        cont["lin_vel"] = template_state.parts.lin_vel
        cont["ang_vel"] = template_state.parts.ang_vel
        cont["qpos"] = template_state.qpos
        cont["qvel"] = template_state.qvel
    if isinstance(env, CursorEnv):
        cont["cursor_pos"] = template_state.cursor_pos
    x0, unravel = ravel_pytree(cont)
    n_sub = substeps or env.config.n_substeps

    if isinstance(env, CursorEnv):
        # holding pattern frozen at plan-build time (discrete bookkeeping);
        # the action path through the held groups is what makes B = ∂f/∂u
        # nonzero, i.e. the planner can actually steer the dynamics
        sel = np.asarray(template_state.selected)
        cfg = env.config

        # contact-free substep for the gradient surrogate
        if smooth_grads:
            import dataclasses

            from ..physics.engine import make_substep

            substep_smooth = make_substep(
                env.tables, dataclasses.replace(cfg.sim, solver_iters=0)
            )

        def make_f(substep_fn):
            def f_impl(x, u):
                c = unravel(x)
                parts = template_state.parts._replace(
                    pos=c["pos"], quat=c["quat"],
                    lin_vel=jnp.zeros_like(template_state.parts.lin_vel),
                    ang_vel=jnp.zeros_like(template_state.parts.ang_vel),
                )
                group = template_state.group
                cursor = c["cursor_pos"]
                held = jnp.zeros(env.model.n_parts, bool)
                # smooth surrogate of _step_discrete (env/furniture.py:
                # 800-845): cursor teleport + rigid-group co-move/rotate,
                # without the non-smooth boundary-revert branches
                for i in range(2):
                    act = u[7 * i : 7 * i + 7]
                    move = act[:3] * cfg.move_speed
                    cursor = cursor.at[i].add(move)
                    if sel[i] < 0:
                        continue
                    base = int(sel[i])
                    held = held | (group == group[base])
                    target_quat = T.euler_to_quat(
                        act[3:6] * cfg.rotate_speed, parts.quat[base]
                    )
                    parts = env.ops.move_group(
                        parts, group, base, move, target_quat
                    )
                cursor = jnp.clip(
                    cursor, -cfg.cursor_boundary, cfg.cursor_boundary
                )

                # reference control step (env/furniture.py:2857-2887): part
                # velocities zeroed, held groups gravity-compensated, settle
                from ..physics.engine import substeps as substeps_fn

                gscale = jnp.where(held, 0.0, 1.0)
                parts = substeps_fn(substep_fn, parts, group, gscale, n_sub)
                out = dict(c)
                out.update(pos=parts.pos, quat=parts.quat, cursor_pos=cursor)
                return ravel_pytree(out)[0]

            return f_impl

        f_full = make_f(env.substep)
        if smooth_grads:
            f_smooth = make_f(substep_smooth)

            @jax.custom_vjp
            def f(x, u):
                return f_full(x, u)

            def f_fwd(x, u):
                _, pullback = jax.vjp(f_smooth, x, u)
                return f_full(x, u), pullback

            def f_bwd(pullback, g):
                return pullback(g)

            f.defvjp(f_fwd, f_bwd)
            # expose the contact-free twin for the surrogate line search
            # (make_ilqr f_surrogate)
            f.f_smooth = f_smooth
        else:
            f = f_full

    else:

        def f(x, u):
            c = unravel(x)
            st = template_state._replace(
                parts=template_state.parts._replace(
                    pos=c["pos"], quat=c["quat"],
                    lin_vel=c["lin_vel"], ang_vel=c["ang_vel"],
                ),
                qpos=c["qpos"],
                qvel=c["qvel"],
            )
            ctrl = env._format_ctrl(
                {arm: u[6 * i : 6 * i + len(env.robot.arm_actuators[arm])]
                 if env.control_type not in ("ik", "ik_quaternion")
                 else u[: len(env.robot.arm_actuators[arm])]
                 for i, arm in enumerate(env.arms)},
                {arm: u[-1] for arm in env.arms},
            )
            st = env._sim_substeps(st, ctrl, None, n_sub)
            out = dict(c)
            out.update(
                pos=st.parts.pos, quat=st.parts.quat,
                lin_vel=st.parts.lin_vel, ang_vel=st.parts.ang_vel,
                qpos=st.qpos, qvel=st.qvel,
            )
            return ravel_pytree(out)[0]

    return f, x0, unravel
