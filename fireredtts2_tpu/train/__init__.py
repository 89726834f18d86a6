"""Training: loss wiring, optimizer, sharded train step."""
