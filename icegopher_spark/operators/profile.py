"""Dataset profiling and drift detection — the observability ops a
100 TB training-data pipeline runs before and after every ingest.

``profile_columns`` — per-column null counts, distinct counts, min/max,
numeric means in ONE job.  Two modes mirroring ANALYZE
(`iceberg/maintenance.py::compute_table_stats`):

  * exact: ``count(distinct col)`` per column.  Spark plans multiple
    distinct aggregates via EXPAND (one row copy per distinct branch)
    — a single shuffle whose width scales with the column count, so
    it's the small-N / audit mode.
  * approx: HyperLogLog++ ``approx_count_distinct`` (rsd parameter) —
    fully map-side-combinable, ONE pass at any column count; the
    100 TB default.

``drift_psi`` — Population Stability Index between a reference and a
current sample of the same column, over equal-width bins derived from
the REFERENCE min/max (so the binning is stable when the current data
shifts — the whole point).  PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref)
with additive smoothing on empty bins.  Everything up to the final
20-row PSI fold is map-side-combinable aggregation; the binning uses
only IEEE-exact ops (−, /, floor, clamp) so it reproduces bit-for-bit
across engines — the oracle replays it in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "drift_psi"]


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    mode: str = "exact",
    approx_rsd: float = 0.05,
) -> DataFrame:
    """One row per profiled column:
    (column, n_rows, n_nulls, n_distinct, min_value, max_value, mean).

    min/max are rendered as strings (one output schema for mixed column
    types); mean is NULL for non-numeric columns. ``n_distinct`` counts
    non-null values, exact or HLL++ depending on ``mode``.
    """
    if mode not in ("exact", "approx"):
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    cols = list(columns or df.columns)
    missing = set(cols) - set(df.columns)
    if missing:
        raise ValueError(f"columns not in DataFrame: {sorted(missing)}")
    numeric = {
        name
        for name, t in df.dtypes
        if t in ("tinyint", "smallint", "int", "bigint", "float", "double")
        or t.startswith("decimal")
    }

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn__{c}"))
        if mode == "exact":
            aggs.append(F.count_distinct(F.col(c)).alias(f"nd__{c}"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c), rsd=approx_rsd).alias(f"nd__{c}")
            )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"mn__{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"mx__{c}"))
        if c in numeric:
            aggs.append(F.avg(F.col(c)).alias(f"avg__{c}"))

    wide = df.agg(*aggs)
    # pivot the single wide row into one row per column — a STACK over
    # a 1-row frame, not a shuffle
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn__{c}")).alias("n_nulls"),
            F.col(f"nd__{c}").cast("bigint").alias("n_distinct"),
            F.col(f"mn__{c}").alias("min_value"),
            F.col(f"mx__{c}").alias("max_value"),
            (
                F.round(F.col(f"avg__{c}"), 4)
                if c in numeric
                else F.lit(None).cast("double")
            ).alias("mean"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def drift_psi(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    n_bins: int = 20,
    smoothing: float = 0.5,
) -> DataFrame:
    """PSI between ``ref`` and ``cur`` distributions of ``value_col``,
    optionally per group (both sides must carry ``group_cols``).

    Returns (group_cols…, psi, n_ref, n_cur). Convention: PSI < 0.1
    stable, 0.1–0.25 moderate shift, > 0.25 action. Bin edges come
    from the GLOBAL reference min/max (broadcast, 1 row); values
    outside land in the edge bins (clamp). Smoothing adds
    ``smoothing`` pseudo-counts per bin so empty bins contribute a
    finite penalty instead of ±inf.
    """
    group_cols = list(group_cols or [])
    v = F.col(value_col).cast("double")

    bounds = ref.agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi")
    )

    def binned(df: DataFrame, side: str) -> DataFrame:
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
        raw = F.floor((v - F.col("__lo")) / width)
        bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
        return (
            df.join(F.broadcast(bounds))
            .select(*group_cols, bin_.alias("bin"))
            .groupBy(*group_cols, "bin")
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    r = binned(ref, "ref")
    c = binned(cur, "cur")
    # full outer: a bin present on one side only is exactly the drift
    # signal; coalesce to 0 then smooth
    on = [*group_cols, "bin"]
    m = r.join(c, on, "full_outer").fillna({"n_ref": 0, "n_cur": 0})

    tot = m.groupBy(*group_cols).agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    m = m.join(tot, group_cols) if group_cols else m.join(F.broadcast(tot))
    s = F.lit(float(smoothing))
    p_ref = (F.col("n_ref") + s) / (F.col("t_ref") + s * n_bins)
    p_cur = (F.col("n_cur") + s) / (F.col("t_cur") + s * n_bins)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    out = m.groupBy(*group_cols).agg(
        F.round(F.sum(term), 4).alias("psi"),
        F.sum("n_ref").cast("bigint").alias("n_ref"),
        F.sum("n_cur").cast("bigint").alias("n_cur"),
    )
    return out
