#!/usr/bin/env python
"""Convert the reference benchmark's declarative model data (MJCF XML bodies,
assembly-recipe YAML, controller gain tables) into furniture_tpu's compact
JSON asset schema.

This is a *data* converter: it extracts the numeric scene description
(bodies, joints, geoms, sites, welds, init poses, actuator gains) that
defines the IKEA furniture assembly task suite, and re-serializes it in our
own schema under ``furniture_tpu/assets/``. The runtime framework never
parses MJCF; it only loads these JSON specs and compiles them to arrays
(``furniture_tpu/models/compiler.py``).

Source layout it reads (reference: ``furniture/env/models/assets/``):
  objects/*.xml       furniture models (parts = top-level worldbody bodies)
  robots/*/robot.xml  robot arm models
  grippers/*.xml      gripper models
  recipes/*.yaml      assembly order / waypoints / thresholds
  base.xml            global sim options

Usage:  python tools/convert_assets.py [--ref /root/reference] [--out furniture_tpu/assets]
"""

from __future__ import annotations

import argparse
import json
import re
import xml.etree.ElementTree as ET
from pathlib import Path

import yaml


def _floats(s: str | None, default=None):
    if s is None:
        return default
    return [float(x) for x in s.replace(",", " ").split()]


def _f(s: str | None, default=None):
    return float(s) if s is not None else default


def _i(s: str | None, default=None):
    return int(s) if s is not None else default


def parse_geom(g: ET.Element) -> dict:
    d = {
        "name": g.get("name"),
        "type": g.get("type", "sphere"),
        "size": _floats(g.get("size"), [0.0]),
        "pos": _floats(g.get("pos"), [0, 0, 0]),
        "quat": _floats(g.get("quat"), [1, 0, 0, 0]),
        "density": _f(g.get("density"), 1000.0),
        "mass": _f(g.get("mass")),
        "contype": _i(g.get("contype"), 1),
        "conaffinity": _i(g.get("conaffinity"), 1),
        "friction": _floats(g.get("friction"), [1.0, 0.005, 0.0001]),
        "margin": _f(g.get("margin"), 0.0),
        "gap": _f(g.get("gap"), 0.0),
        "solref": _floats(g.get("solref"), [0.02, 1.0]),
        "solimp": _floats(g.get("solimp"), [0.9, 0.95, 0.001]),
        "condim": _i(g.get("condim"), 3),
        "group": _i(g.get("group"), 0),
        "fromto": _floats(g.get("fromto")),
        "mesh": g.get("mesh"),
        "rgba": _floats(g.get("rgba"), [0.5, 0.5, 0.5, 1.0]),
    }
    return d


def parse_site(s: ET.Element) -> dict:
    return {
        "name": s.get("name"),
        "pos": _floats(s.get("pos"), [0, 0, 0]),
        "quat": _floats(s.get("quat"), [1, 0, 0, 0]),
        "size": _floats(s.get("size"), [0.005]),
        "type": s.get("type", "sphere"),
        "group": _i(s.get("group"), 0),
    }


def parse_joint(j: ET.Element) -> dict:
    return {
        "name": j.get("name"),
        "type": j.get("type", "hinge"),
        "pos": _floats(j.get("pos"), [0, 0, 0]),
        "axis": _floats(j.get("axis"), [0, 0, 1]),
        "range": _floats(j.get("range")),
        "limited": j.get("limited", "false") == "true",
        "damping": _f(j.get("damping"), 0.0),
        "armature": _f(j.get("armature"), 0.0),
        "frictionloss": _f(j.get("frictionloss"), 0.0),
    }


def parse_body_tree(body: ET.Element, parent: int, out: list) -> None:
    idx = len(out)
    entry = {
        "name": body.get("name"),
        "parent": parent,
        "pos": _floats(body.get("pos"), [0, 0, 0]),
        "quat": _floats(body.get("quat"), [1, 0, 0, 0]),
        "inertial": None,
        "joints": [],
        "geoms": [],
        "sites": [],
    }
    out.append(entry)
    for child in body:
        if child.tag == "inertial":
            entry["inertial"] = {
                "mass": _f(child.get("mass"), 0.0),
                "pos": _floats(child.get("pos"), [0, 0, 0]),
                "quat": _floats(child.get("quat"), [1, 0, 0, 0]),
                "diaginertia": _floats(child.get("diaginertia"), [0, 0, 0]),
            }
        elif child.tag == "joint":
            entry["joints"].append(parse_joint(child))
        elif child.tag == "geom":
            entry["geoms"].append(parse_geom(child))
        elif child.tag == "site":
            entry["sites"].append(parse_site(child))
        elif child.tag == "body":
            parse_body_tree(child, idx, out)


def convert_mjcf(path: Path) -> dict:
    root = ET.parse(path).getroot()
    spec: dict = {
        "model": root.get("model", path.stem),
        "source": str(path),
        "bodies": [],
        "actuators": [],
        "equality": [],
        "custom": {},
    }
    wb = root.find("worldbody")
    if wb is not None:
        for body in wb.findall("body"):
            parse_body_tree(body, -1, spec["bodies"])
        # worldbody-level geoms (e.g. arena floor)
        spec["world_geoms"] = [parse_geom(g) for g in wb.findall("geom")]
    act = root.find("actuator")
    if act is not None:
        for a in act:
            spec["actuators"].append(
                {
                    "name": a.get("name"),
                    "kind": a.tag,  # velocity | position | motor
                    "joint": a.get("joint"),
                    "kv": _f(a.get("kv")),
                    "kp": _f(a.get("kp")),
                    "gear": _floats(a.get("gear"), [1.0]),
                    "ctrlrange": _floats(a.get("ctrlrange")),
                    "forcerange": _floats(a.get("forcerange")),
                }
            )
    eq = root.find("equality")
    if eq is not None:
        for w in eq.findall("weld"):
            spec["equality"].append(
                {
                    "type": "weld",
                    "body1": w.get("body1"),
                    "body2": w.get("body2"),
                    "active": w.get("active", "true") == "true",
                    "solimp": _floats(w.get("solimp"), [0.9, 0.95, 0.001]),
                    "solref": _floats(w.get("solref"), [0.02, 1.0]),
                }
            )
    cust = root.find("custom")
    if cust is not None:
        for n in cust.findall("numeric"):
            spec["custom"][n.get("name")] = _floats(n.get("data"))
    opt = root.find("option")
    if opt is not None:
        spec["option"] = dict(opt.attrib)
    return spec


# -- recipes ----------------------------------------------------------------

class _RefLoader(yaml.SafeLoader):
    pass


for _tag in ("python/tuple", "python/list"):
    _RefLoader.add_constructor(
        f"tag:yaml.org,2002:{_tag}",
        lambda loader, node: list(loader.construct_sequence(node)),
    )


def convert_recipe(path: Path) -> dict:
    with open(path) as f:
        data = yaml.load(f, Loader=_RefLoader)
    return data


# -- hjson (controller gains) ----------------------------------------------

def hjson_to_json(text: str) -> dict:
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    text = re.sub(r"//[^\n]*", "", text)
    return json.loads(text)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "furniture_tpu" / "assets"))
    args = ap.parse_args()

    assets = Path(args.ref) / "furniture" / "env" / "models" / "assets"
    out = Path(args.out)
    (out / "furniture").mkdir(parents=True, exist_ok=True)
    (out / "recipes").mkdir(parents=True, exist_ok=True)
    (out / "robots").mkdir(parents=True, exist_ok=True)
    (out / "grippers").mkdir(parents=True, exist_ok=True)

    n = 0
    for xml in sorted((assets / "objects").glob("*.xml")):
        spec = convert_mjcf(xml)
        (out / "furniture" / f"{xml.stem}.json").write_text(json.dumps(spec))
        n += 1
    print(f"furniture: {n}")

    n = 0
    for ydir in sorted((assets / "recipes").glob("*.yaml")):
        data = convert_recipe(ydir)
        (out / "recipes" / f"{ydir.stem}.json").write_text(json.dumps(data))
        n += 1
    print(f"recipes: {n}")

    for robot_dir in sorted((assets / "robots").iterdir()):
        if not robot_dir.is_dir():
            continue
        for variant in ["robot.xml", "robot_torque.xml"]:
            p = robot_dir / variant
            if p.exists():
                spec = convert_mjcf(p)
                suffix = "" if variant == "robot.xml" else "_torque"
                (out / "robots" / f"{robot_dir.name}{suffix}.json").write_text(
                    json.dumps(spec)
                )
                print(f"robot: {robot_dir.name}{suffix}")

    for gxml in sorted((assets / "grippers").glob("*.xml")):
        spec = convert_mjcf(gxml)
        (out / "grippers" / f"{gxml.stem}.json").write_text(json.dumps(spec))
    print("grippers done")

    # global sim options (base.xml: impratio, cone, nconmax/njmax)
    base = convert_mjcf(assets / "base.xml")
    root = ET.parse(assets / "base.xml").getroot()
    size = root.find("size")
    base["size"] = dict(size.attrib) if size is not None else {}
    (out / "base.json").write_text(json.dumps(base))

    # arena floor description (FloorArena: 3x2m plane, friction set by env)
    arena_xml = assets / "arenas" / "floor_arena.xml"
    if arena_xml.exists():
        (out / "arena.json").write_text(json.dumps(convert_mjcf(arena_xml)))

    # controller gains
    hj = Path(args.ref) / "furniture" / "env" / "controllers" / "controller_config.hjson"
    if hj.exists():
        (out / "controller_config.json").write_text(
            json.dumps(hjson_to_json(hj.read_text()))
        )
    print("done")


if __name__ == "__main__":
    main()
