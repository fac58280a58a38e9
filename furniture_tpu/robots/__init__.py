"""Articulated robot arms: chain compiler + batched kinematics/dynamics.

TPU-first replacement for the reference's MuJoCo robot models
(``furniture/env/models/robots/*``) and MuJoCo's articulated dynamics: the
robot becomes a static array description (``CompiledRobot``) and all per-step
computation (FK, Jacobians, mass matrix, joint-space integration) is pure
jax, ``vmap``-batched over environments.
"""

from .chain import CompiledRobot, compile_robot, AGENT_SPECS
from . import kinematics

__all__ = ["CompiledRobot", "compile_robot", "kinematics", "AGENT_SPECS"]
