"""Multi-chip scaling: mesh construction, sharding specs, collectives."""
