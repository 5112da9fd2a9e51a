"""Structured Streaming ingest into hypertables.

The reference's ingest path (``src/copy.c``, ``ModifyHypertable``
``src/nodes/modify_hypertable.c``) routes each tuple to its chunk,
creates missing chunks on demand, and appends cagg invalidations at
transaction end (``tsl/src/continuous_aggs/insert.c:208``). Our analog is
a ``foreachBatch`` sink: each micro-batch is routed via
``Hypertable.insert`` (derived ``_chunk`` partition column = tuple
routing; new partition dirs = on-demand chunk creation; per-batch
min/max(ts) = invalidation capture).

Exactly-once: ``foreachBatch`` can replay a batch after failure, so each
``(stream_id, batch_id)`` is recorded in the catalog and replays are
skipped — the idempotent-sink pattern Spark documents for non-
transactional stores. This replaces the reference's reliance on
PostgreSQL transactional COPY.

Late data: NOT dropped. Spark's ``withWatermark`` tolerance model is
deliberately unused for correctness — arbitrarily late rows land in old
chunks and dirty ranges flow through the invalidation log, so the next
cagg refresh repairs the aggregates (SURVEY §2.8: the reference handles
late data by invalidation, not by dropping).

Direct-compress (``compress=True``) mirrors the reference's
direct-compress GUCs (``src/guc.c:527-598``): completed chunks — those
whose range ends before the batch's max timestamp minus a hold-off — are
compressed inline after the append.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame

from ..functions.time import parse_interval
from ..hypertable import Hypertable


class StreamIngest:
    """Configured streaming sink for one hypertable; call :meth:`start`."""

    def __init__(
        self,
        ht: Hypertable,
        checkpoint_dir: str,
        stream_id: Optional[str] = None,
        compress_after: Union[str, int, None] = None,
        refresh_caggs: bool = False,
    ):
        self.ht = ht
        self.checkpoint_dir = checkpoint_dir
        # default stream identity includes the CHECKPOINT location: two
        # streams into the same hypertable (different sources/
        # checkpoints) must not collide on (stream_id, batch_id) — a
        # collision makes the second stream's batches look replayed and
        # silently drops its data. Batch ids are scoped to a checkpoint,
        # so the checkpoint is the natural identity.
        if stream_id is None:
            import hashlib
            import os as _os

            ck = hashlib.sha1(
                _os.path.abspath(checkpoint_dir).encode()
            ).hexdigest()[:10]
            stream_id = f"stream_{ht.name}_{ck}"
        self.stream_id = stream_id
        self.compress_after = compress_after
        self.refresh_caggs = refresh_caggs

    # ---------------------------------------------------------------- sink
    def _seen_key(self, batch_id: int) -> dict:
        return {"key": f"stream_batch_{self.stream_id}_{batch_id}"}

    def process_batch(self, df: DataFrame, batch_id: int) -> dict:
        """foreachBatch body. Public so batch jobs can reuse the same
        idempotent routing (e.g. backfill replays)."""
        meta = self.ht.ts.catalog.table("metadata")
        if meta.find_one(**self._seen_key(batch_id)):
            return {"rows": 0, "chunks": [], "replayed": True}
        stats = self.ht.insert(df)
        # record the completion marker IMMEDIATELY after the insert: a
        # failure in the optional post-processing below would otherwise
        # replay the batch and ingest every row twice (both compression
        # and refresh are safe to re-run; re-inserting is not)
        meta.append([{**self._seen_key(batch_id), "value": stats["rows"]}])
        if self.compress_after is not None and stats["rows"]:
            self._compress_completed(df)
        if self.refresh_caggs and stats["rows"]:
            self._refresh_watching_caggs()
        return stats

    def _compress_completed(self, batch_df: Optional[DataFrame] = None) -> None:
        from pyspark.sql import functions as F

        from ..compression import compress_chunks
        from ..hypertable import _to_internal

        spec = self.compress_after
        if isinstance(spec, int):
            hold_us = int(spec)
        else:
            iv = parse_interval(spec)
            # months count too (jobs._ht_cutoff parity) — dropping them
            # made '1 month' a zero hold-off that compressed the
            # actively-filling chunk on every batch
            hold_us = iv.us + iv.months * 30 * 86_400_000_000
        # hold-off is measured from the latest DATA timestamp, not the
        # newest chunk's range_end (which can sit most of a chunk
        # interval past the data and compress seconds-old rows)
        now_i = None
        if batch_df is not None and self.ht.time_column in batch_df.columns:
            mx = batch_df.agg(
                F.max(self.ht.time_column).alias("mx")
            ).collect()[0]["mx"]
            if mx is not None:
                now_i = _to_internal(mx)
        if now_i is None:
            ends = [c["range_end"] for c in self.ht.chunks()]
            if not ends:
                return
            now_i = max(ends)
        cutoff = now_i - hold_us
        compress_chunks(self.ht, older_than=cutoff)

    def _refresh_watching_caggs(self) -> None:
        from ..caggs import ContinuousAggregate

        cat = self.ht.ts.catalog
        for row in cat.continuous_agg.find(hypertable_id=self.ht.id):
            ContinuousAggregate.get(self.ht.ts, row["name"]).refresh()

    # --------------------------------------------------------------- start
    def start(
        self,
        stream_df: DataFrame,
        trigger: Optional[dict] = None,
        query_name: Optional[str] = None,
    ):
        """Attach to a streaming DataFrame and start the query.

        ``trigger``: kwargs for ``DataStreamWriter.trigger`` (e.g.
        ``{"availableNow": True}`` for catch-up runs,
        ``{"processingTime": "10 seconds"}`` for continuous ingest).
        """
        writer = (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName(query_name or self.stream_id)
        )
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()


def stream_insert(
    ht: Hypertable,
    stream_df: DataFrame,
    checkpoint_dir: str,
    trigger: Optional[dict] = None,
    **kw,
):
    """One-call form: ``stream_insert(ht, df, ckpt, trigger={...})``."""
    return StreamIngest(ht, checkpoint_dir, **kw).start(stream_df, trigger=trigger)
