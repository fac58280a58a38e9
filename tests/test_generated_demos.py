"""Generated-demo artifacts: schema + BC consumability.

The committed demos under ``demos/generated/`` are full scripted
assemblies recorded by ``tools/generate_demos.py`` on TPU (reference
``DemoRecorder`` schema, ``util/demo_recorder.py:33-87``); the BC/GAIL
pipelines must train on them directly — the demo→IL loop the reference
supports end-to-end (``README.md:95-122``)."""

import glob
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from furniture_tpu import rl

DEMO_GLOBS = [
    os.path.join(os.path.dirname(__file__), "..", "demos", d, "*.pkl")
    for d in ("generated",)
]


@pytest.fixture(scope="module")
def demos():
    files = sorted(f for g in DEMO_GLOBS for f in glob.glob(g))
    if not files:
        pytest.skip("no generated demos committed")
    return [pickle.load(open(f, "rb")) for f in files]


def test_generated_demo_schema(demos):
    for d in demos:
        # DemoRecorder invariant (util/demo_recorder.py:85)
        assert len(d["obs"]) == len(d["actions"]) + 1
        assert len(d["rewards"]) == len(d["actions"])
        ob = d["obs"][0]
        assert "object_ob" in ob and "robot_ob" in ob
        assert np.isfinite(np.asarray(d["actions"])).all()
        assert d["metadata"]["agent"] == "Sawyer"
        if d.get("states"):
            # full reference-schema state stream (util/demo_recorder.py:33-56)
            assert len(d["states"]) == len(d["actions"]) + 1
            assert len(d["connect_actions"]) == len(d["actions"])
            st = d["states"][0]
            for k in ("parts_pos", "parts_quat", "qpos", "qvel", "group"):
                assert k in st, k


@pytest.fixture(scope="module")
def short_demo():
    """Generate one real demo on CPU: scripted assembly from reset with
    ``num_connects=1`` (success at the first connect — measured at ~210
    steps on this seed), recording the full reference-schema streams."""
    from furniture_tpu.config import EnvConfig
    from furniture_tpu.envs.sawyer_gen import FurnitureSawyerGenEnv

    env = FurnitureSawyerGenEnv(
        EnvConfig(
            agent_type="Sawyer", control_type="ik", num_connects=1,
        )
    )
    demos_out, stats = env.generate_demos(
        1, seed=0, batch=2, max_steps=360, record_obs=True
    )
    if not demos_out:
        pytest.fail(f"no first-connect demo in 360 steps (stats {stats})")
    return env, demos_out[0]


def test_demo_states_replay_connect(short_demo):
    """State-replay closure: restoring the recorded pre-connect state and
    stepping the recorded action reproduces the recorded connect
    (reference state-based run_demo, ``env/furniture.py:2183``)."""
    env, demo = short_demo
    assert len(demo["states"]) == len(demo["actions"]) + 1
    nconn = np.array([int(s["num_connected"]) for s in demo["states"]])
    assert nconn[-1] >= 1
    t_conn = int(np.argmax(nconn >= 1)) - 1  # action index causing connect
    assert demo["connect_actions"][t_conn], "connect step has no connect bit"

    base = jax.jit(env.reset)(jax.random.PRNGKey(7))
    st = env.restore_snapshot(base, demo["states"][t_conn])
    st2, obs, rew, done, info = jax.jit(env.step)(
        st, jnp.asarray(demo["actions"][t_conn])
    )
    assert int(st2.num_connected) == int(nconn[t_conn + 1]), (
        "recorded connect did not reproduce under state replay"
    )


def test_demo_seeds_init_pool(short_demo):
    """Demo states harvest into an init-state pool that a fresh env resets
    from (reference ``--load_init_states``, ``env/furniture.py:127-130``)."""
    from furniture_tpu.utils.init_pool import pool_from_demo

    env, demo = short_demo
    pool = pool_from_demo(demo, stride=60)
    assert pool["pos"].shape[0] >= 2
    env.set_init_state_pool(pool)
    try:
        s = jax.jit(env.reset)(jax.random.PRNGKey(11))
        assert np.isfinite(np.asarray(s.parts.pos)).all()
        assert np.isfinite(np.asarray(s.qpos)).all()
    finally:
        env.set_init_state_pool(None)


def test_bc_trains_on_generated_demos(demos):
    X, Y = rl.demos_to_dataset(demos)
    assert X.shape[0] == sum(len(d["actions"]) for d in demos)
    init, fit, predict = rl.make_bc(
        X.shape[-1], Y.shape[-1], rl.BCConfig(lr=3e-4)
    )
    st = init(jax.random.PRNGKey(0))
    st, m0 = fit(st, X, Y)
    for _ in range(4):
        st, m = fit(st, X, Y)
    assert np.isfinite(float(m["mse"]))
    assert float(m["mse"]) < float(m0["mse"]), "BC loss did not decrease"
    # the policy regresses toward demo actions on the training set
    pred = predict(st.params, X[:64])
    assert pred.shape == (64, Y.shape[-1])
