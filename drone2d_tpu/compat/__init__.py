from drone2d_tpu.compat.gym_env import Drone2dGymEnv, make, register_gym_envs

__all__ = ["Drone2dGymEnv", "make", "register_gym_envs"]
