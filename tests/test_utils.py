"""Utility subsystem tests: native trajectory store, demo recorder,
video recorder, stopwatch, info dict."""

import os
import tempfile

import numpy as np
import pytest

from furniture_tpu.utils import DemoRecorder, Info, StopWatch, VideoRecorder, load_demo


def test_native_traj_store_roundtrip():
    from furniture_tpu.utils.traj_store import TrajStore

    path = tempfile.mktemp(suffix=".ftr")
    rng = np.random.RandomState(0)
    trajs = [
        (
            rng.randn(30 + i, 8).astype(np.float32),
            rng.randn(30 + i).astype(np.float32),
        )
        for i in range(12)
    ]
    try:
        with TrajStore(path, "w") as ts:
            for a, r in trajs:
                ts.append(a, r)
            ts.flush()
        with TrajStore(path, "r") as ts:
            assert len(ts) == len(trajs)
            for i in (0, 5, 11):
                a, r, e = ts.read(i)
                np.testing.assert_array_equal(a, trajs[i][0])
                np.testing.assert_array_equal(r, trajs[i][1])
                assert e.shape == (len(r), 0)
    finally:
        if os.path.exists(path):
            os.remove(path)


def test_native_traj_store_extras():
    from furniture_tpu.utils.traj_store import TrajStore

    path = tempfile.mktemp(suffix=".ftr")
    a = np.ones((10, 3), np.float32)
    r = np.arange(10, dtype=np.float32)
    e = np.full((10, 5), 2.0, np.float32)
    try:
        with TrajStore(path, "w") as ts:
            ts.append(a, r, e)
        with TrajStore(path, "r") as ts:
            a2, r2, e2 = ts.read(0)
            np.testing.assert_array_equal(e2, e)
    finally:
        if os.path.exists(path):
            os.remove(path)


def test_demo_recorder_schema(tmp_path):
    rec = DemoRecorder(demo_dir=str(tmp_path))
    for t in range(3):
        rec.add(ob={"o": t}, action=np.ones(4) * t, reward=float(t))
    rec.add(ob={"o": 3})
    path = rec.save("Test_")
    demo = load_demo(path)
    assert len(demo["obs"]) == len(demo["actions"]) + 1  # demo_recorder.py:81
    assert demo["rewards"] == [0.0, 1.0, 2.0]


def test_video_recorder_fallback(tmp_path):
    vr = VideoRecorder(record_dir=str(tmp_path), fps=5)
    for _ in range(4):
        vr.capture_frame(np.zeros((8, 8, 3), np.uint8))
    out = vr.close("clip")
    assert out is not None and os.path.exists(out)
    assert len(vr) == 0  # buffer cleared


def test_stopwatch_and_info():
    sw = StopWatch()
    sw.start("a")
    sw.stop("a")
    assert "a" in sw.average()
    info = Info()
    info.add({"x": 1.0})
    info.add({"x": 3.0})
    assert info.get_dict()["x"] == 2.0
