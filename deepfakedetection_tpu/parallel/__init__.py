"""Device-mesh parallelism: jax.sharding over ICI (data × model axes)."""
