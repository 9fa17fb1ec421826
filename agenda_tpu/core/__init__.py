from agenda_tpu.core.schedules import (
    DiffusionSchedule,
    make_schedule,
    add_noise,
    get_velocity,
    compute_snr,
    min_snr_weights,
    ddim_timesteps,
    ddim_step,
    plms_timesteps,
    plms_init_state,
    plms_step,
)
from agenda_tpu.core.ema import ema_init, ema_update

__all__ = [
    "DiffusionSchedule",
    "make_schedule",
    "add_noise",
    "get_velocity",
    "compute_snr",
    "min_snr_weights",
    "ddim_timesteps",
    "ddim_step",
    "plms_timesteps",
    "plms_init_state",
    "plms_step",
    "ema_init",
    "ema_update",
]
