"""drone2d_tpu — a TPU-native 2D drone path-following RL framework.

A ground-up JAX/XLA re-design of the capabilities of
Jorgenlf/Drone-2d-custom-gym-env-for-reinforcement-learning
(reference mounted read-only at /root/reference):

* the pymunk (Chipmunk2D/C) rigid-body simulation becomes an analytic,
  batched symplectic-Euler integrator (`drone2d_tpu.ops.physics`),
* the scipy `fminbound` closest-point-on-path search becomes a dense
  arc-length table + fixed-iteration golden-section refine
  (`drone2d_tpu.ops.path`),
* the SubprocVecEnv process parallelism becomes `vmap` over thousands of
  env states on a chip and `shard_map` over a device mesh
  (`drone2d_tpu.parallel`),
* stable-baselines3 PPO becomes an on-device PPO learner
  (`drone2d_tpu.learn.ppo`).

Everything on the device path is a pure function over fixed-shape pytrees:
``step(cfg, state, action) -> (state, obs, reward, done, info)``.
"""

from drone2d_tpu.config import EnvConfig, PPOConfig, TrainConfig

__version__ = "0.1.0"

__all__ = ["EnvConfig", "PPOConfig", "TrainConfig", "__version__"]
