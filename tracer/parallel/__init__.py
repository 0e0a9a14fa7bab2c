"""Multi-device sharding: mesh construction, sharded render/grad steps."""
