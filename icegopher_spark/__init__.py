"""icegopher_spark — a PySpark-native lakehouse engine with the
capabilities of zeroshade/icegopher (Iceberg metadata plane) plus
LLM-data-pipeline operators, designed for 100 TB scale.

Layout:
  schema / literals / expressions / transforms / metadata / manifest —
      the Iceberg metadata plane (pure driver-side Python, mirrors the
      reference's semantics; citations in each module).
  catalog/ — static-file + REST catalogs.
  table.py — Table + scan builder; plans file lists, hands execution to
      Spark DataFrames.
  operators/ — dedup, similarity, text analysis, as-of join (Spark
      DataFrame compositions; the extension surface).
  queries.py — the driver-facing registry (queries + DuckDB oracles).
"""

from __future__ import annotations
