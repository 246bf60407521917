"""Loss-weight schedules.

reference: MBExWN_NVoc/vocoder/model/training_utils.py:16-29 ships only the
constant stub; linear/exponential ramps are provided here because the config
schema (spect_loss_schedule, pp_teacher_forcing_schedule) implies them.
"""
from __future__ import annotations

import jax.numpy as jnp


class ParamSchedule:
    def __init__(self, initial, name, type="constant", final=None, start_step=0, end_step=0,
                 quiet=True, **kwargs):
        self.type = type
        self.initial = initial
        self.final = final if final is not None else initial
        self.start_step = start_step
        self.end_step = end_step
        self.name = name

    def __call__(self, step):
        if self.type == "constant" or self.end_step <= self.start_step:
            return self.initial
        frac = jnp.clip((step - self.start_step) / (self.end_step - self.start_step), 0.0, 1.0)
        if self.type == "linear":
            return self.initial + (self.final - self.initial) * frac
        if self.type == "exponential":
            return self.initial * (self.final / self.initial) ** frac
        raise RuntimeError(f"ParamSchedule::unknown schedule type {self.type}")

    def get_config(self):
        return {"initial": self.initial, "type": self.type, "name": self.name}
