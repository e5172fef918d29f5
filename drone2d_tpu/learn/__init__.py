from drone2d_tpu.learn.ppo import (
    PPOLearner,
    TrainState,
    RolloutBatch,
    EpisodeStats,
)

__all__ = ["PPOLearner", "TrainState", "RolloutBatch", "EpisodeStats"]
