"""Multi-device sharding: mesh construction, sharded SED sweeps."""
