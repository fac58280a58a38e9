"""Batched rigid-body physics for furniture parts.

TPU-first design notes
----------------------
The reference runs MuJoCo's C contact solver with runtime-activated weld
equality constraints (``env/furniture.py:2761-2776``). Here, welded parts are
instead merged into **composite rigid bodies**: the per-env ``group`` labeling
array (the union-find of ``env/furniture.py:2738-2760`` flattened to a label
array) defines rigid groups, and integration/contact impulses act on the
group's composite mass/inertia. This removes equality-constraint iterations
entirely, is exactly rigid (MuJoCo's weld with ``solimp="1 1 0.5"`` is a stiff
approximation of the same thing), and maps to masked segment-sums — ideal for
the VPU.

Everything is a pure function of ``(PartState, model arrays, masks)`` and is
``vmap``-batched over environments.
"""

from .state import PartState, init_state  # noqa: F401
from .engine import substeps, control_step  # noqa: F401
