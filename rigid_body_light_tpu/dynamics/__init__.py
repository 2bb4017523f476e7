"""Time integration: deterministic and fluctuating BD steppers."""

from rigid_body_light_tpu.dynamics.stepper import (
    deterministic_step,
    make_differentiable_step,
    stochastic_step,
    run_bd,
)

__all__ = [
    "deterministic_step",
    "make_differentiable_step",
    "stochastic_step",
    "run_bd",
]
