"""Pure-function controller suite.

TPU-native replacements for the reference's torque-space controllers
(``controllers/arm_controller.py``) and the five pybullet IK controllers
(``controllers/sawyer_ik_controller.py`` etc.) — all batched jax, no
side-engine, no URDF.
"""

from .ik import dls_ik, ik_velocities
from .osc import (
    joint_impedance_torques,
    joint_velocity_torques,
    orientation_error,
    osc_torques,
    load_controller_config,
)

__all__ = [
    "dls_ik",
    "ik_velocities",
    "osc_torques",
    "joint_impedance_torques",
    "joint_velocity_torques",
    "orientation_error",
    "load_controller_config",
]
