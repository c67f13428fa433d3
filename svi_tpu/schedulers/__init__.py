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
    "FlowMatchSchedule",
    "FlowMatchScheduler",
    "add_noise",
    "make_schedule",
    "return_to_timestep",
    "step",
    "training_target",
    "training_weight",
]
