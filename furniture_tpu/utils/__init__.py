"""Host-side utilities: logging, info aggregation, demo recording/replay."""

from .logger import logger, StopWatch  # noqa: F401
from .info_dict import Info  # noqa: F401
from .demo import DemoRecorder, load_demo  # noqa: F401
