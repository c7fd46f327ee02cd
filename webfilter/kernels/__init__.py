"""Pure (non-Spark) kernels: each is a deterministic function over
numpy/pandas batches, unit-testable without a SparkSession, and wrapped
exactly once by a vectorized pandas UDF in the Spark layer."""
