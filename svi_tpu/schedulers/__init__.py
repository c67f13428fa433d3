from .continuous_ode import ContinuousODEScheduler
from .ddim import EnhancedDDIMScheduler
from .flow_match import (
    FlowMatchSchedule,
    FlowMatchScheduler,
    add_noise,
    make_schedule,
    return_to_timestep,
    step,
    training_target,
    training_weight,
)

__all__ = [
    "ContinuousODEScheduler",
    "EnhancedDDIMScheduler",
    "FlowMatchSchedule",
    "FlowMatchScheduler",
    "add_noise",
    "make_schedule",
    "return_to_timestep",
    "step",
    "training_target",
    "training_weight",
]
