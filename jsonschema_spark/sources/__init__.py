"""Sources: Spark session factory, testdata table loaders, deterministic
synthetic corpus generator."""
