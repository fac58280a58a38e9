"""RL stack tests (BC / PPO / SAC / GAIL) — the reference trains these via
the external ``method`` package (``run.py:1-18``, ``README.md:95-122``);
the in-repo analogue must at least update parameters, keep metrics finite,
shard over a mesh, and fit expert data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furniture_tpu.config import EnvConfig, SimConfig
from furniture_tpu.envs.cursor import CursorEnv
from furniture_tpu import rl


@pytest.fixture(scope="module")
def tiny_env():
    # short control step keeps jit time small; same code path as default
    return CursorEnv(EnvConfig(sim=SimConfig(control_freq=100, solver_iters=2)))


def _params_delta(a, b):
    return sum(
        float(jnp.abs(x - y).sum())
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_ppo_iteration_updates_params(tiny_env):
    init, train = rl.make_ppo(
        tiny_env,
        rl.PPOConfig(num_envs=4, rollout_len=4, epochs=2, num_minibatches=2,
                     hidden=(32, 32)),
    )
    st = init(jax.random.PRNGKey(0))
    st2, m = train(st)
    assert _params_delta(st.params, st2.params) > 0.0
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    assert int(st2.step) == 1


def test_ppo_sharded_mesh(tiny_env):
    from furniture_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    init, train = rl.make_ppo(
        tiny_env,
        rl.PPOConfig(num_envs=16, rollout_len=2, epochs=1, num_minibatches=2,
                     hidden=(16, 16)),
        mesh=mesh,
    )
    st = init(jax.random.PRNGKey(1))
    st, m = train(st)
    assert np.isfinite(float(m["loss"]))
    # env lanes stay batched at the global size
    assert jax.tree.leaves(st.env_states)[0].shape[0] == 16


def test_sac_fills_buffer_and_updates(tiny_env):
    init, train = rl.make_sac(
        tiny_env,
        rl.SACConfig(num_envs=2, buffer_size=64, batch_size=8, hidden=(16, 16),
                     warmup=2, updates_per_step=1),
    )
    st = init(jax.random.PRNGKey(2))
    p0 = st.params["pi"]
    for _ in range(4):
        st, m = train(st)
    assert int(st.buffer.size) == 8
    assert _params_delta(p0, st.params["pi"]) > 0.0
    assert np.isfinite(float(m["q_loss"]))


def test_bc_fits_linear_expert():
    rng = np.random.RandomState(0)
    X = rng.randn(512, 6).astype(np.float32)
    W = 0.3 * rng.randn(6, 3).astype(np.float32)
    Y = X @ W
    init, fit, predict = rl.make_bc(6, 3, rl.BCConfig(batch_size=64, hidden=(64, 64)))
    st = init(jax.random.PRNGKey(3))
    for _ in range(150):
        st, m = fit(st, X, Y)
    assert float(m["mse"]) < 0.02
    pred = predict(st.params, jnp.asarray(X[:4]))
    assert np.allclose(np.asarray(pred), Y[:4], atol=0.5)


def test_bc_demo_dataset_roundtrip():
    demos = [
        {
            "obs": [{"a": np.ones(3), "b": np.zeros(2)}] * 4,
            "actions": [np.arange(5, dtype=np.float32)] * 3,
        }
    ]
    X, Y = rl.demos_to_dataset(demos)
    assert X.shape == (3, 5) and Y.shape == (3, 5)
    # sorted-key flattening: a then b
    assert np.allclose(X[0], [1, 1, 1, 0, 0])


def test_gail_discriminator_separates(tiny_env):
    # expert at +1, policy at -1 in a 4-dim (obs+act) space
    obs_d, act_d = 2, 2
    expert_obs = np.ones((256, obs_d), np.float32)
    expert_act = np.ones((256, act_d), np.float32)
    g_init, disc_reward, disc_update, _ = rl.make_gail(
        tiny_env, rl.PPOConfig(), rl.GAILConfig(hidden=(32, 32), disc_updates=20),
        expert_obs, expert_act,
    )
    st, _ = g_init(jax.random.PRNGKey(4))
    pol_obs = -np.ones((256, obs_d), np.float32)
    pol_act = -np.ones((256, act_d), np.float32)
    for _ in range(5):
        st, m = disc_update(st, jnp.asarray(pol_obs), jnp.asarray(pol_act))
    assert float(m["disc_acc"]) > 0.9
    rfn = disc_reward(st.params)
    r_exp = rfn(jnp.asarray(expert_obs[:8]), jnp.asarray(expert_act[:8]), 0.0)
    r_pol = rfn(jnp.asarray(pol_obs[:8]), jnp.asarray(pol_act[:8]), 0.0)
    assert float(r_exp.mean()) > float(r_pol.mean())


def test_checkpoint_roundtrip(tiny_env, tmp_path):
    """save_checkpoint/load_checkpoint restore the full PPO training state
    (reference ckpt path logic: util/pytorch.py:27-48)."""
    from furniture_tpu.utils.checkpoint import (
        checkpoint_step,
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    init, train = rl.make_ppo(
        tiny_env,
        rl.PPOConfig(num_envs=4, rollout_len=4, epochs=1, num_minibatches=2,
                     hidden=(16, 16)),
    )
    st = init(jax.random.PRNGKey(0))
    st, _ = train(st)
    save_checkpoint(str(tmp_path), st, 0)
    st, _ = train(st)
    save_checkpoint(str(tmp_path), st, 1)

    path = latest_checkpoint(str(tmp_path))
    assert path is not None and checkpoint_step(path) == 1
    restored = load_checkpoint(path, init(jax.random.PRNGKey(7)))
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # pruning: keep=1 leaves only the newest
    save_checkpoint(str(tmp_path), st, 2, keep=1)
    assert checkpoint_step(latest_checkpoint(str(tmp_path))) == 2
    import os
    assert len([n for n in os.listdir(tmp_path) if n.startswith("ckpt_")]) == 1


def test_evaluate_success_rate(tiny_env):
    """make_evaluate runs deterministic policy rollouts and reports
    success_rate/mean_reward/mean_episode_len (the reference's eval-HDF5
    success aggregation, collect_results.py:10-32)."""
    init, _ = rl.make_ppo(
        tiny_env, rl.PPOConfig(num_envs=2, rollout_len=2, hidden=(16, 16))
    )
    st = init(jax.random.PRNGKey(0))
    evaluate = rl.make_evaluate(tiny_env, rl.ppo_act, n_episodes=4, max_steps=3)
    m = evaluate(st.params, jax.random.PRNGKey(1))
    assert 0.0 <= float(m["success_rate"]) <= 1.0
    assert np.isfinite(float(m["mean_reward"]))
    assert 0.0 <= float(m["mean_episode_len"]) <= 3.0
