"""JAX/XLA/Pallas device kernels over columnar read batches."""
