"""Training subsystem: optimizer, train step, pipeline, checkpoints, loop."""
