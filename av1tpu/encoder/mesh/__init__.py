"""Multi-chip scaling: shard_map tile-row sharding + ICI halo exchange."""
