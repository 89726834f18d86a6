"""Multi-chip parallelism: mesh + sharding rules."""
