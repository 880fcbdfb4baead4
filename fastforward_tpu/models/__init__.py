"""JAX/flax model towers used by the Transformer encoders."""
