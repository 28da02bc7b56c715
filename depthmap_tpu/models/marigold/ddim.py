"""DDIM scheduler (deterministic, eta=0) for Marigold denoising.

SD2 noise schedule: scaled_linear betas 0.00085 -> 0.012 over 1000 steps;
prediction type 'v_prediction' (Marigold is SD2.1-v based) with an epsilon
fallback for checkpoints that use it.
"""
from __future__ import annotations

import numpy as np


class DDIMScheduler:
    def __init__(self, num_train_timesteps: int = 1000,
                 beta_start: float = 0.00085, beta_end: float = 0.012,
                 prediction_type: str = "v_prediction",
                 steps_offset: int = 1):
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps) ** 2
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        # SD2/Marigold scheduler config: steps_offset=1 (every timestep the
        # UNet sees is shifted by one) and set_alpha_to_one=False — the
        # final step's alpha_prev is alphas_cumprod[0], not 1.0
        self.steps_offset = steps_offset
        self.final_alpha_cumprod = self.alphas_cumprod[0]
        self.timesteps = None

    def set_timesteps(self, num_inference_steps: int):
        step = self.num_train_timesteps // num_inference_steps
        self.timesteps = ((np.arange(0, num_inference_steps) * step)[::-1]
                          .round().astype(np.int64) + self.steps_offset)
        return self.timesteps

    def step(self, model_output, timestep: int, sample):
        """One DDIM step (eta = 0); arrays are jnp or np, broadcast over
        batch/space."""
        import jax.numpy as jnp
        prev_t = timestep - self.num_train_timesteps // len(self.timesteps)
        a_t = self.alphas_cumprod[timestep]
        a_prev = self.alphas_cumprod[prev_t] if prev_t >= 0 \
            else self.final_alpha_cumprod
        sqrt_at = float(np.sqrt(a_t))
        sqrt_1mat = float(np.sqrt(1 - a_t))

        if self.prediction_type == "v_prediction":
            pred_x0 = sqrt_at * sample - sqrt_1mat * model_output
            eps = sqrt_at * model_output + sqrt_1mat * sample
        else:  # epsilon
            pred_x0 = (sample - sqrt_1mat * model_output) / sqrt_at
            eps = model_output

        prev = float(np.sqrt(a_prev)) * pred_x0 + \
            float(np.sqrt(1 - a_prev)) * eps
        return prev, pred_x0
