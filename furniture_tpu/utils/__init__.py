"""Host-side utilities: logging, info aggregation, demo recording/replay."""

from .logger import logger, StopWatch  # noqa: F401
from .info_dict import Info  # noqa: F401
from .demo import DemoRecorder, load_demo  # noqa: F401
from .video_recorder import VideoRecorder  # noqa: F401
# TrajStore imported lazily (compiles the native library on first use):
#   from furniture_tpu.utils.traj_store import TrajStore
