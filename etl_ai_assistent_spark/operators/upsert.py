"""K4 external batched-upsert sink (reference qdrant_service.py:24-42).

The reference pushes every parsed paragraph to its vector store with one
network upsert PER CHUNK inside a Python loop — the per-row-RPC
anti-pattern. The Spark-first shape is: executors push PARTITION-LOCAL
BATCHES through ``foreachPartition``, with the store client constructed
inside the task (never a live socket captured in a closure), bounded
batch sizes, and per-batch retry with exponential backoff. Total RPC
count is ceil(rows / batch_size), parallelized across executors — at
100 TB the sink scales with the cluster and the store's ingest quota,
not the driver.

Like the EmbedClient seam (operators/embedder.py), the client contract
is one batch method. The hermetic/test adapter writes parquet locally
and is deterministic; a production adapter (HTTP vector store, JDBC,
etc.) implements the same two methods and nothing else changes.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame


class VectorStoreClient:
    """Contract an external point-store adapter implements. Construction
    happens INSIDE the executor task (the factory is shipped, not the
    client), so implementations may open sockets in __init__.

    ``upsert_batch`` must be idempotent per point id (retry safety): a
    replayed batch may not duplicate points — which is exactly the
    vector-store upsert contract the reference relies on."""

    def upsert_batch(self, points: list[dict]) -> None:
        raise NotImplementedError

    def close(self) -> None:  # optional: flush/teardown per task
        pass


class LocalParquetStoreClient(VectorStoreClient):
    """Deterministic local adapter — the hermetic stand-in for an HTTP
    vector store in tests (one parquet file per upserted batch, named by
    task partition + batch ordinal so reruns overwrite rather than
    append). On a cluster this shape would write executor-local or
    object storage; it exists so the verified path has zero network."""

    def __init__(self, out_dir: str, *, epoch: int = 0):
        self.out_dir = out_dir
        self.epoch = epoch  # micro-batch id for streams; 0 for batch jobs
        self._n = 0
        os.makedirs(out_dir, exist_ok=True)

    def upsert_batch(self, points: list[dict]) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        cols: dict[str, list] = {k: [p[k] for p in points] for k in points[0]}
        # Filename carries (epoch, partition, ordinal): a REPLAY of the same
        # micro-batch overwrites its own files (idempotent), while distinct
        # micro-batches never collide — partition ids restart at 0 per batch.
        pq.write_table(
            pa.table(cols),
            os.path.join(
                self.out_dir, f"e{self.epoch:05d}_part_{pid:05d}_{self._n:05d}.parquet"
            ),
        )
        self._n += 1


class FlakyStoreClient(VectorStoreClient):
    """Test adapter: fails the first ``fail_first`` attempts per task
    (marker files under ``out_dir``) then delegates to the local parquet
    adapter — exercises the retry path end to end."""

    def __init__(self, out_dir: str, fail_first: int = 1):
        self.inner = LocalParquetStoreClient(out_dir)
        self.fail_dir = os.path.join(out_dir, "_failures")
        self.fail_first = fail_first
        os.makedirs(self.fail_dir, exist_ok=True)

    def upsert_batch(self, points: list[dict]) -> None:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        marker = os.path.join(self.fail_dir, f"p{pid}_b{self.inner._n}")
        tries = len(os.listdir(marker)) if os.path.isdir(marker) else 0
        if tries < self.fail_first:
            os.makedirs(marker, exist_ok=True)
            open(os.path.join(marker, f"t{tries}"), "w").close()
            raise ConnectionError("injected store failure")
        self.inner.upsert_batch(points)


def upsert_points(
    df: DataFrame,
    client_factory,
    *,
    batch_size: int = 256,
    max_retries: int = 3,
    retry_backoff_s: float = 0.0,
) -> None:
    """Batched distributed upsert: every partition opens ONE client,
    groups its rows into ``batch_size`` point batches, and retries each
    batch up to ``max_retries`` times with exponential backoff. Rows are
    shipped as plain dicts (id / vector / payload columns — whatever the
    DataFrame carries; deterministic ids are P14's job upstream)."""

    def _send(rows) -> None:
        client = client_factory()
        try:
            batch: list[dict] = []

            def flush() -> None:
                if not batch:
                    return
                for attempt in range(max_retries):
                    try:
                        client.upsert_batch(batch)
                        break
                    except Exception:
                        if attempt == max_retries - 1:
                            raise
                        time.sleep(retry_backoff_s * (2**attempt))
                batch.clear()

            for row in rows:
                batch.append(row.asDict(recursive=True))
                if len(batch) >= batch_size:
                    flush()
            flush()
        finally:
            client.close()

    df.foreachPartition(_send)


def stream_upsert_points(
    df: DataFrame,
    client_factory,
    *,
    checkpoint: str,
    batch_size: int = 256,
    max_retries: int = 3,
) -> None:
    """Streaming twin: foreachBatch hands each micro-batch to the same
    batched partition writer (streaming/pipeline.stream_to_parquet is the
    local-parquet sibling). The checkpoint's batch tracking plus the
    store's idempotent per-id upsert give effectively-once delivery.
    Drains the finite source to completion.

    The micro-batch id is threaded into the client factory when the
    factory EXPLICITLY opts in by declaring a parameter literally named
    ``batch_id`` (``client_factory(batch_id)``) so adapters that key
    output on task partition ids — which RESTART at 0 every micro-batch —
    can disambiguate batches instead of silently overwriting the previous
    one. A zero-arg factory still works (store-side idempotence by point
    id makes the epoch irrelevant for true upsert stores). A factory
    whose required parameter means something else (e.g. a client class
    whose ``__init__`` takes a path/url) is NOT silently fed the batch
    id — it fails with the ordinary missing-argument TypeError instead."""
    import inspect

    try:
        params = inspect.signature(client_factory).parameters
        # The opt-in is explicit: a parameter literally named `batch_id`
        # that can be bound positionally or by keyword. Treating "has any
        # required positional param" as opt-in would silently bind the
        # batch id to an unrelated required parameter (path, url, ...)
        # instead of failing loudly.
        accepts_batch_id = any(
            name == "batch_id"
            and p.kind
            in (
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
                inspect.Parameter.KEYWORD_ONLY,
            )
            for name, p in params.items()
        )
    except (TypeError, ValueError):  # builtins / C callables
        accepts_batch_id = False

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        factory = (
            (lambda: client_factory(batch_id=batch_id))
            if accepts_batch_id
            else client_factory
        )
        upsert_points(
            batch_df, factory, batch_size=batch_size, max_retries=max_retries
        )

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
