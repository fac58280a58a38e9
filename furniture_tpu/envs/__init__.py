"""Environment implementations (pure jitted step functions + state pytrees)."""

from .cursor import CursorEnv, CursorState  # noqa: F401
