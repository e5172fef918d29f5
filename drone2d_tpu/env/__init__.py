"""Environment layer: pure-function drone env over fixed-shape pytrees."""

from drone2d_tpu.env.types import EnvState, ObstacleSet, StepOutput
from drone2d_tpu.env.env import Drone2DEnv

__all__ = ["Drone2DEnv", "EnvState", "ObstacleSet", "StepOutput"]
