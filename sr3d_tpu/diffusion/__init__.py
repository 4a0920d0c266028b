from .schedules import (DiffusionSchedule, make_beta_schedule, make_schedule,
                        schedule_from_config)
from .gaussian import (SampleOutput, p_losses_continuous, p_losses_discrete,
                       p_mean_variance, p_sample_loop, predict_start_from_noise,
                       q_posterior, q_sample_discrete, q_sample_gamma,
                       sample_continuous_gamma)
from .ema import EmaState, ema_init, ema_update

__all__ = [
    "DiffusionSchedule", "make_beta_schedule", "make_schedule",
    "schedule_from_config", "SampleOutput", "p_losses_continuous",
    "p_losses_discrete", "p_mean_variance", "p_sample_loop",
    "predict_start_from_noise", "q_posterior", "q_sample_discrete",
    "q_sample_gamma", "sample_continuous_gamma", "EmaState", "ema_init",
    "ema_update",
]
