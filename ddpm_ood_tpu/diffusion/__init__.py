from .schedules import (  # noqa: F401
    NoiseSchedule,
    make_beta_schedule,
    make_schedule,
    apply_snr_shift,
    add_noise,
    velocity_from_x0_eps,
    pred_x0_from_model_output,
    epsilon_from_model_output,
)
from .ddpm import ddpm_step, ddpm_sample  # noqa: F401
from .ddim import ddim_step, ddim_denoise, ddim_timesteps  # noqa: F401
from .dpm_solver import dpm_denoise, dpm_step, dpm_timesteps  # noqa: F401
from .elbo import elbo_kl_weights, elbo_terms_from_model  # noqa: F401
from .plms import (  # noqa: F401
    PLMSState,
    pndm_timesteps,
    pndm_start_points,
    plms_init_state,
    plms_step,
    plms_denoise,
)
