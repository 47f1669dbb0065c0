"""Sinks: partitioned parquet/CSV point exports + presentation stubs."""
