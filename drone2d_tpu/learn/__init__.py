from drone2d_tpu.learn.ppo import (
    PPOLearner,
    TrainState,
    RolloutBatch,
    EpisodeStats,
)
from drone2d_tpu.learn.zoo import ZooTrainer, save_zoo, train_zoo

__all__ = [
    "PPOLearner",
    "TrainState",
    "RolloutBatch",
    "EpisodeStats",
    "ZooTrainer",
    "save_zoo",
    "train_zoo",
]
