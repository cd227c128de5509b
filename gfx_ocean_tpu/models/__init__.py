from .ocean import (
    OceanFields,
    OceanState,
    make_step,
    make_rollout,
    ocean_state_from_assets,
    ocean_state_from_phillips,
    step,
)

__all__ = [
    "OceanFields",
    "OceanState",
    "make_rollout",
    "make_step",
    "ocean_state_from_assets",
    "ocean_state_from_phillips",
    "step",
]
