"""Streaming Delta sink: ``writeStream.foreachBatch`` → one Delta
commit per micro-batch, exactly-once across restarts via the
protocol's TRANSACTION IDENTIFIERS (txn actions) — the same mechanism
delta-spark's own streaming sink uses, and the Delta twin of
`iceberg_sink.py` (which rides snapshot summaries instead).

Exactly-once: foreachBatch is at-least-once; each commit carries
``{"txn": {"appId": <query-id>, "version": <batch-id>}}`` in the SAME
atomic commit as its adds.  A replayed batch sees its id at or below
the table's recorded app version (`DeltaSnapshot.app_versions`, fed by
log replay AND checkpoints — the protocol requires checkpoints to
carry the latest txn per appId, and `write_checkpoint` does) and
becomes a no-op.

At scale: the per-batch append writes parquet executor-side (the
normal staged write) and ONE json commit; pair with `optimize_delta`
on a schedule to keep small files bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..delta import load_delta
from ..delta_write import append_delta

__all__ = ["write_stream_to_delta", "last_committed_batch"]


def last_committed_batch(table_path: str, query_id: str) -> int:
    """Latest batch id committed for this query (-1 if none)."""
    return load_delta(table_path).app_versions.get(query_id, -1)


def write_stream_to_delta(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    query_id: str,
) -> None:
    """Run ``stream`` to completion (availableNow) into the Delta table
    at ``table_path``, one commit per micro-batch, idempotent on
    (query_id, batch_id)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(table_path, query_id):
            return  # replay of an already-committed batch: no-op
        append_delta(
            batch_df.sparkSession, table_path, batch_df, txn=(query_id, batch_id)
        )

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
