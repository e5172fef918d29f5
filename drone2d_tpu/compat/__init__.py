from drone2d_tpu.compat.gym_env import Drone2dGymEnv, make

__all__ = ["Drone2dGymEnv", "make"]
