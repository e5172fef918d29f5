from drone2d_tpu.eval.episode import EpisodeResults, run_episodes

__all__ = ["EpisodeResults", "run_episodes"]
