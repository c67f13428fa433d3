from .continuous_ode import ContinuousODEScheduler
from .fm_solvers import (
    FlowDPMSolverMultistepScheduler,
    FlowUniPCMultistepScheduler,
    get_sampling_sigmas,
    retrieve_timesteps,
)
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
    "FlowDPMSolverMultistepScheduler",
    "FlowUniPCMultistepScheduler",
    "get_sampling_sigmas",
    "retrieve_timesteps",
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
