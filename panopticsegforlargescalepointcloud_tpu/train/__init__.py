"""Training: steps, optimizers/schedulers, trainer, checkpointing."""
