#!/usr/bin/env python
"""Furniture resizer CLI — the reference's ``demo_resizer.py`` /
``run_resizer`` (``env/furniture.py:2626-2694``) + XML rescaler
(``env/xml_adjusting/rescale.py``) rebuilt over JSON asset specs.

Writes a scaled copy of a furniture spec (and prints the compiled part
masses so the scaling is auditable)::

    python tools/resize.py table_lack_0825 --scale 1.3 --out table_lack_big
"""

from __future__ import annotations

import argparse
import json
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("furniture")
    p.add_argument("--scale", type=float, required=True)
    p.add_argument("--out", default=None, help="output spec name (default <name>_x<scale>)")
    args = p.parse_args()

    from furniture_tpu.models import ASSET_DIR, compile_model, load_spec, scale_spec

    spec = load_spec("furniture", args.furniture)
    scaled = scale_spec(spec, args.scale)
    out_name = args.out or f"{args.furniture}_x{args.scale:g}".replace(".", "p")
    scaled["model"] = out_name
    out_path = ASSET_DIR / "furniture" / f"{out_name}.json"
    with open(out_path, "w") as f:
        json.dump(scaled, f)
    print(f"wrote {out_path}")

    before = compile_model(args.furniture)
    after = compile_model(args.furniture, size_scale=args.scale)
    for name, m0, m1 in zip(before.part_names, before.part_mass, after.part_mass):
        print(f"  {name}: mass {m0:.4f} -> {m1:.4f} kg "
              f"(x{m1 / max(m0, 1e-12):.2f})")


if __name__ == "__main__":
    main()
