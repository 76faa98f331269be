"""Iceberg metadata plane, PySpark-native.

Re-creates the capabilities of the reference (zeroshade/icegopher, a Go
Iceberg metadata library) with the data plane supplied by Spark
DataFrames: types/schemas, expressions, table metadata, manifests,
scan planning with stats-based pruning, catalogs, and a write path.

Everything here is driver-side planning code — small, latency-bound,
pure Python. The output of a scan plan is a list of parquet files fed
to ``spark.read.parquet``; from there Catalyst/Tungsten take over.
"""
