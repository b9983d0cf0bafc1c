"""Multi-device (mesh-sharded) solving."""
