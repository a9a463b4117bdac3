"""Multi-device scale-out: mesh construction + sharded rendering."""
