from drone2d_tpu.compat.gym_env import Drone2dGymEnv, make, register_gym_envs
from drone2d_tpu.compat.vector_env import Drone2dVectorEnv

__all__ = ["Drone2dGymEnv", "Drone2dVectorEnv", "make", "register_gym_envs"]
