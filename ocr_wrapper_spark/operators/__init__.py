"""Spark DataFrame operators built on the kernels (Arrow-batched UDFs only)."""
