"""Host-side utilities: config IO, metrics, checkpointing, host path math."""
