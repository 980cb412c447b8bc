"""Core gating primitives: differentiable gates, schedules, resource losses."""

from dynmm_tpu.core.gates import (
    diff_softmax,
    gumbel_softmax,
    straight_through,
)
from dynmm_tpu.core.schedules import ExpDecayTemp, linear_temp
from dynmm_tpu.core.resource import (
    expected_cost_loss,
    budget_hinge,
    GateStats,
)

__all__ = [
    "diff_softmax",
    "gumbel_softmax",
    "straight_through",
    "ExpDecayTemp",
    "linear_temp",
    "expected_cost_loss",
    "budget_hinge",
    "GateStats",
]
