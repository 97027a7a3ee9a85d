"""Training: optimizer/state, schedules, losses, metrics, loop, checkpoints."""
