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
import numpy as np
import pytest

from furniture_tpu import rl

DEMO_GLOBS = [
    os.path.join(os.path.dirname(__file__), "..", "demos", d, "*.pkl")
    for d in ("generated", "generated2")
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
