"""iLQR planner tests: convergence on a known system + differentiability of
the contact physics surrogate dynamics."""

import jax
import jax.numpy as jnp
import numpy as np

from furniture_tpu.config import EnvConfig, SimConfig
from furniture_tpu.envs.cursor import CursorEnv
from furniture_tpu.planning import ILQRConfig, flatten_env_dynamics, make_ilqr


def test_ilqr_double_integrator():
    dt = 0.1

    def f(x, u):
        return jnp.stack([x[0] + dt * x[1], x[1] + dt * u[0]])

    def rc(x, u, t):
        return 0.01 * jnp.sum(u**2) + 0.1 * (x[0] - 1.0) ** 2

    def tc(x):
        return 10.0 * ((x[0] - 1.0) ** 2 + x[1] ** 2)

    cfg = ILQRConfig(horizon=20, iterations=15, u_min=-5, u_max=5)
    plan = jax.jit(make_ilqr(f, rc, tc, cfg))
    us, info = plan(jnp.zeros(2), jnp.zeros((20, 1)))
    assert float(info["cost"]) < 0.15 * float(info["cost0"])
    x = jnp.zeros(2)
    for u in np.asarray(us):
        x = f(x, jnp.asarray(u))
    assert abs(float(x[0]) - 1.0) < 0.05
    assert abs(float(x[1])) < 0.05


def test_env_dynamics_differentiable():
    """The flattened contact-physics surrogate must produce finite gradients
    (the property iLQR linearization relies on)."""
    env = CursorEnv(
        EnvConfig(sim=SimConfig(control_freq=100, solver_iters=4))
    )
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    f, x0, unravel = flatten_env_dynamics(env, s, substeps=2)

    def loss(x):
        return jnp.sum(f(x, jnp.zeros(15)) ** 2)

    g = jax.jit(jax.grad(loss))(x0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0
