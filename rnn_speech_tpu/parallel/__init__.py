"""Device-mesh parallelism: mesh construction and sharded train steps."""
