from drone2d_tpu.models.policy import (
    ActorCriticParams,
    init_actor_critic,
    policy_value,
    sample_action,
    action_log_prob_entropy,
    deterministic_action,
)

__all__ = [
    "ActorCriticParams",
    "init_actor_critic",
    "policy_value",
    "sample_action",
    "action_log_prob_entropy",
    "deterministic_action",
]
