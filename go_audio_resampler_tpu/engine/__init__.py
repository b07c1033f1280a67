"""TPU engine: topology planning, traced stage kernels, one-shot and
streaming execution."""

from .plan import EnginePlan, EngineConfigError, plan_engine, MIN_RATIO, MAX_RATIO
from .counts import LengthModel
from .oneshot import oneshot
from .streaming import EngineCore

__all__ = [
    "EnginePlan", "EngineConfigError", "plan_engine", "MIN_RATIO",
    "MAX_RATIO", "LengthModel", "oneshot", "EngineCore",
]
