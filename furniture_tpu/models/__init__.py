"""Model registry for furniture_tpu.

Mirrors the reference registry (``furniture/env/models/__init__.py:8-35``):
glob-sorted furniture list with stable integer ids, agent names, and
background names (backgrounds are only meaningful with a renderer; kept for
API parity).
"""

from __future__ import annotations

from pathlib import Path

ASSET_DIR = Path(__file__).resolve().parent.parent / "assets"

furniture_xmls = sorted(p.name for p in (ASSET_DIR / "furniture").glob("*.json"))
furniture_names = [p[: -len(".json")] for p in furniture_xmls]
furniture_name2id = {name: i for i, name in enumerate(furniture_names)}
furniture_ids = list(range(len(furniture_names)))

background_names = [
    "Industrial",
    "Lab",
    "Garage",
    "Ambient",
    "NightTime",
    "Interior",
    "STC",
]

agent_names = ["Baxter", "Sawyer", "Panda", "Jaco", "Fetch", "Cursor"]

from .compiler import (  # noqa: E402,F401
    CompiledModel,
    compile_from_config,
    compile_model,
    load_spec,
    scale_spec,
)
