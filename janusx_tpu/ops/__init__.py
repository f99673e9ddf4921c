"""Device kernels: 2-bit decode, blocked matmuls, batched optimizers."""
