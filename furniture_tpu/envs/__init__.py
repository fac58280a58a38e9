"""Environment implementations (pure jitted step functions + state pytrees)."""

from .cursor import CursorEnv, CursorState  # noqa: F401
from .arm import (  # noqa: F401
    ArmEnv,
    ArmState,
    BaxterEnv,
    FetchEnv,
    JacoEnv,
    PandaEnv,
    SawyerEnv,
)
from .sawyer_dense import DenseState, FurnitureSawyerDenseRewardEnv  # noqa: F401
from .sawyer_gen import FurnitureSawyerGenEnv, GenPolicyState  # noqa: F401
from .baxter_toytable import FurnitureBaxterToyTableEnv  # noqa: F401
