"""Custom Python DataSource SINK (Spark 4 `pyspark.sql.datasource` API)
— JSON-lines shards + an atomically-committed manifest.

The counterpart of sources/synthetic.py's reader: what a bespoke export
connector (feature store push, labeling-queue feed, vendor upload)
implements. The shape demonstrates Spark's two-phase commit protocol,
which is how every real lake writer achieves atomicity:

1. `write(iterator)` runs per TASK on the executors: each task streams
   its partition to a uniquely-named shard file (task retries produce
   new names, never torn files) and returns a commit MESSAGE describing
   what it wrote;
2. `commit(messages)` runs ONCE on the driver only after every task
   succeeded: it writes the manifest listing exactly the committed
   shards — MERGED with the previous manifest in append mode, replaced
   in overwrite mode. Readers resolve the manifest first, so orphan
   shards from failed/speculative attempts (and overwritten
   generations) are invisible — rename-free atomicity on stores
   without atomic rename;
3. `abort()` runs on failure and leaves no manifest — the write never
   happened as far as readers are concerned.

Scope: shards and manifest land on a filesystem every node shares
(local[here] / NFS / fuse-mounted object store). On a multi-host
cluster with node-local disks, point `path` at shared storage — the
same caveat bucketed.py documents for its writer.
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"
GENERATION_FILE = "_GENERATION.json"
GENERATION_PENDING_FILE = "_GENERATION.pending.json"


def _write_json_atomic(path: str, payload: dict) -> None:
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _manifest_generation(batch_dir: str):
    """Generation stamp of a committed batch dir, or None when the dir
    has no manifest / no stamp / an unreadable manifest."""
    mpath = os.path.join(batch_dir, MANIFEST)
    try:
        with open(mpath) as f:
            return json.load(f).get("generation")
    except (OSError, ValueError):
        return None


def _json_default(v):
    """Serializer for the Spark column types json.dumps cannot handle
    natively (timestamp/date -> ISO strings, decimal -> str, binary ->
    hex)."""
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    raise TypeError(f"not JSON serializable: {type(v).__name__}")


def _ts_to_utc_iso(v: datetime.datetime) -> str:
    """TimestampType serialization: normalize the INSTANT to UTC with an
    explicit +00:00 offset. Spark hands the Python writer TimestampType
    values as naive datetimes in the WORKER's local zone (measured: the
    same literal arrives as a different wall time under TZ=UTC vs
    TZ=America/Chicago), so a naive isoformat round-trips correctly only
    when writer-local zone == reader session zone — any other pairing
    silently shifts every instant. astimezone() on a naive datetime
    attaches the local zone, then the UTC conversion makes the string
    zone-independent; readers parse the offset and recover the instant
    under ANY session timezone."""
    return v.astimezone(datetime.timezone.utc).isoformat()


@dataclass
class ShardCommit(WriterCommitMessage):
    path: str
    n_rows: int


class JsonlManifestDataSource(DataSource):
    """`df.write.format("jsonl_manifest").save(path)` /
    `spark.read.format("jsonl_manifest").load(path)` — the write AND
    read halves of the same custom format, so the two-phase-commit
    story closes end to end: the reader resolves the manifest first
    and schedules ONE input partition PER COMMITTED SHARD (a real
    connector's split planning), so orphan shards from failed or
    speculative attempts are never scanned and shard-level parallelism
    matches the writer's task layout."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool) -> "JsonlManifestWriter":
        return JsonlManifestWriter(self.options, schema, overwrite)

    def schema(self):
        # Driver-side plan step: the manifest's stored DDL is the source
        # of truth (never JSON inference — all-empty shards and
        # timestamp degradation). A missing manifest is a hard error by
        # design: "no manifest => the write never happened".
        with open(os.path.join(self.options["path"], MANIFEST)) as f:
            manifest = json.load(f)
        if not manifest.get("schema"):
            raise ValueError(
                "jsonl_manifest: manifest has no stored schema; pass "
                ".schema(...) explicitly on the reader"
            )
        from pyspark.sql.types import StructType

        return StructType.fromJson(json.loads(manifest["schema"]))

    def reader(self, schema) -> "JsonlManifestReader":
        return JsonlManifestReader(self.options, schema)


@dataclass
class _ShardPartition(InputPartition):
    path: str


class JsonlManifestReader(DataSourceReader):
    """Manifest-resolved scan: `partitions()` lists exactly the
    committed shards (executor tasks each stream one shard), and
    `read()` restores the JSON-degraded types (ISO timestamps/dates,
    hex binary, string decimals) from the resolved schema — flat rows,
    matching what the writer serializes. Scale shape: the driver
    touches only the manifest; shard bytes stream executor-side, one
    task per shard, exactly like a parquet file scan's split
    planning."""

    def __init__(self, options, schema):
        self.path = options["path"]
        self.schema_json = schema.json()

    def partitions(self):
        with open(os.path.join(self.path, MANIFEST)) as f:
            shards = json.load(f)["shards"]
        # zero committed shards is a legal (empty) dataset: one no-op
        # split keeps Spark's non-empty-partition-list contract
        return [_ShardPartition(s["path"]) for s in shards] or [
            _ShardPartition("")
        ]

    def read(self, partition: _ShardPartition):
        if not partition.path:
            return
        import json as _json

        from pyspark.sql.types import (
            BinaryType,
            DateType,
            DecimalType,
            StructType,
            TimestampNTZType,
            TimestampType,
        )

        schema = StructType.fromJson(_json.loads(self.schema_json))

        def _restore(dt):
            if isinstance(dt, TimestampType):
                # offset-aware ISO strings (the writer emits UTC+00:00)
                # come back as aware datetimes — Spark maps an aware
                # datetime to the correct instant under ANY session
                # timezone. Legacy shards with naive strings fall back to
                # the old (session-zone-dependent) interpretation.
                return datetime.datetime.fromisoformat
            if isinstance(dt, TimestampNTZType):
                return datetime.datetime.fromisoformat
            if isinstance(dt, DateType):
                return datetime.date.fromisoformat
            if isinstance(dt, BinaryType):
                return bytes.fromhex
            if isinstance(dt, DecimalType):
                return decimal.Decimal
            return None

        fields = [(f.name, _restore(f.dataType)) for f in schema.fields]
        with open(partition.path) as fh:
            for line in fh:
                rec = _json.loads(line)
                yield tuple(
                    conv(v)
                    if conv is not None and (v := rec.get(name)) is not None
                    else rec.get(name)
                    for name, conv in fields
                )


class JsonlManifestWriter(DataSourceArrowWriter):
    """Arrow-batched task writer (r14: was the Row-iterator API, whose
    per-row pickle + Row.asDict dominated the sink's cost — the only
    entry whose DuckDB ratio GREW with sf). Each task now receives
    pyarrow RecordBatches; ``to_pylist()`` materializes plain dicts at
    C speed and the JSON text is unchanged byte-for-byte (same
    ``json.dumps`` + ``_json_default``), so committed shards from
    either writer generation read back identically."""

    def __init__(self, options, schema=None, overwrite: bool = False):
        self.path = options["path"]
        # the DDL schema rides the manifest so read-back never relies on
        # JSON inference (which crashes on all-empty shards and degrades
        # timestamps to strings)
        self.schema_json = schema.json() if schema is not None else None
        self.overwrite = overwrite
        # optional run/generation stamp (write_stream_exactly_once): lets
        # read_all_batches distinguish live batch dirs from stale ones
        # left by a PRIOR run whose replay emitted fewer micro-batches
        self.generation = options.get("generation")

    def write(self, iterator) -> ShardCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(
            self.path,
            f"part-{ctx.partitionId():05d}-{uuid.uuid4().hex}.jsonl",
        )
        # TimestampType (an INSTANT) must leave the process normalized to
        # UTC with an explicit offset — see _ts_to_utc_iso. TimestampNTZ
        # is a wall-clock value by definition and stays a naive ISO
        # string via _json_default.
        ts_fields: set[str] = set()
        if self.schema_json is not None:
            from pyspark.sql.types import StructType, TimestampType

            schema = StructType.fromJson(json.loads(self.schema_json))
            ts_fields = {
                f.name for f in schema.fields if isinstance(f.dataType, TimestampType)
            }
        n = 0
        dumps = json.dumps
        with open(shard, "w") as f:
            for batch in iterator:
                # Arrow hands TimestampType columns tz-aware (unlike the
                # Row API's worker-local naive datetimes), so
                # _ts_to_utc_iso's astimezone(utc) is a pure conversion
                for rec in batch.to_pylist():
                    for name in ts_fields:
                        if rec.get(name) is not None:
                            rec[name] = _ts_to_utc_iso(rec[name])
                    f.write(dumps(rec, default=_json_default) + "\n")
                    n += 1
        return ShardCommit(path=shard, n_rows=n)

    def commit(self, messages) -> None:
        # Concurrency contract: ONE writer per sink path at a time (the
        # standard file-sink assumption; Spark's own FileStreamSink makes
        # the same one). Two concurrent append commits would race the
        # read-merge-replace below and the loser's shards would vanish
        # from the manifest.
        new_shards = [{"path": m.path, "n_rows": m.n_rows} for m in messages]
        mpath = os.path.join(self.path, MANIFEST)
        prev_shards: list[dict] = []
        if not self.overwrite and os.path.exists(mpath):
            # APPEND: the new manifest must keep every previously
            # committed shard — replacing it wholesale would orphan all
            # earlier rows (silent data loss for manifest readers)
            with open(mpath) as f:
                prev_shards = json.load(f)["shards"]
        shards = prev_shards + new_shards
        manifest = {
            "shards": shards,
            "n_rows": sum(s["n_rows"] for s in shards),
            "schema": self.schema_json,
        }
        if self.generation is not None:
            manifest["generation"] = int(self.generation)
        # Atomic commit point: write to a temp file in the same
        # directory, then os.replace() over the manifest. A crash
        # mid-write must never leave a truncated manifest — "no (valid)
        # manifest => the write never happened" is the sink's whole
        # durability claim, and an in-place open(mpath, "w") violates it
        # for every PREVIOUSLY committed shard the append-mode manifest
        # now carries.
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, mpath)
        if self.overwrite:
            # stale shards from earlier generations are invisible via
            # the manifest; delete them so overwrite does not leak disk
            live = {s["path"] for s in shards}
            for p in os.listdir(self.path):
                full = os.path.join(self.path, p)
                if p.endswith(".jsonl") and full not in live:
                    os.remove(full)

    def abort(self, messages) -> None:  # pragma: no cover — failure path
        # no manifest => the write never happened for readers; orphan
        # shards are garbage-collected out of band
        pass


def read_manifest(spark, path: str):
    """Manifest-resolved read-back: only committed shards are visible.
    The stored schema (when present) is applied, so empty datasets read
    back correctly and timestamps keep their types."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    shard_paths = [s["path"] for s in manifest["shards"]]
    schema = None
    if manifest.get("schema"):
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(manifest["schema"]))
    if not shard_paths:
        return spark.createDataFrame([], schema), manifest
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.json(shard_paths), manifest


# ---------------------------------------------------------------- streaming
def write_stream_exactly_once(stream_df, path: str, checkpoint_dir: str):
    """End-to-end exactly-once: a streaming frame lands in the
    two-phase-commit manifest sink, idempotent under micro-batch replay.

    This closes the loop synthetic.py's stream reader documents ("the
    replay guarantee is the part that buys end-to-end exactly-once with
    an idempotent sink"): Structured Streaming guarantees each micro-
    batch's DATA is replayed identically after a crash (source offsets
    live in the checkpoint), so exactly-once reduces to making the SINK
    idempotent per (batch_id). Here each batch writes
    ``path/batch=<id>/`` through the jsonl_manifest sink in OVERWRITE
    mode: a replayed batch atomically re-commits the same rows over its
    own previous (possibly partial, manifest-less, hence invisible)
    attempt instead of appending duplicates. foreachBatch is the
    standard escape hatch for custom sinks; the per-batch manifest is
    what makes the retry safe.

    Returns the StreamingQuery (availableNow trigger — the caller
    awaits termination).
    """

    # idempotent format registration — foreachBatch runs driver-side on
    # whatever session the caller holds
    stream_df.sparkSession.dataSource.register(JsonlManifestDataSource)

    # Generation protocol: per-batch-id overwrite alone is idempotent
    # only while batch BOUNDARIES match the prior run — a lost-checkpoint
    # replay that re-emits the same rows in FEWER micro-batches (a
    # different trigger / maxFilesPerTrigger) overwrites only the batch
    # ids it reaches and leaves stale higher-numbered batch dirs that
    # duplicate rows on read. A fresh checkpoint (no committed offsets)
    # is exactly the lost-checkpoint case, so it bumps a sink-level
    # generation counter; every batch manifest is stamped with it and
    # read_all_batches unions ONLY the current generation. Resuming an
    # intact checkpoint keeps the stored generation (the earlier batches
    # of the same run must stay live).
    # Round-9 advice fix: the new generation must NOT go live at sink
    # setup — in the window before the fresh run's first batch commits,
    # a reader seeing the bumped _GENERATION.json would classify every
    # previously committed batch as stale and error even though complete
    # committed data exists. Protocol: setup stages the bumped counter
    # in _GENERATION.pending.json (readers ignore it); the flip to
    # _GENERATION.json happens only AFTER the first batch of the fresh
    # run commits its manifest, so readers keep resolving the prior
    # generation until replacement data is actually on disk. The pending
    # file also keeps resume honest: Structured Streaming writes the
    # offsets entry BEFORE foreachBatch completes, so a crash mid-first-
    # batch resumes with a non-empty checkpoint — the pending file (not
    # the still-old live file) carries the generation that replay must
    # keep stamping.
    offsets_dir = os.path.join(checkpoint_dir, "offsets")
    fresh_run = not (os.path.isdir(offsets_dir) and os.listdir(offsets_dir))
    gpath = os.path.join(path, GENERATION_FILE)
    ppath = os.path.join(path, GENERATION_PENDING_FILE)
    # identity of THIS run's checkpoint: the pending stage is only
    # adoptable by a resume of the run that staged it — a pending file
    # left by a DIFFERENT (aborted, never-committed) run must not leak
    # its generation onto a resume of the prior run's intact checkpoint,
    # which would retire that run's own earlier live batches as stale.
    ckpt_id = os.path.abspath(checkpoint_dir)
    prev_gen = None
    if os.path.exists(gpath):
        with open(gpath) as f:
            prev_gen = int(json.load(f)["generation"])
    pending_gen = None
    pending_ckpt = None
    if os.path.exists(ppath):
        with open(ppath) as f:
            pending = json.load(f)
        pending_gen = int(pending["generation"])
        pending_ckpt = pending.get("checkpoint")
    if fresh_run:
        generation = max(prev_gen or 0, pending_gen or 0) + 1
        os.makedirs(path, exist_ok=True)
        _write_json_atomic(ppath, {"generation": generation, "checkpoint": ckpt_id})
        flip_needed = True
    elif pending_gen is not None and pending_ckpt == ckpt_id:
        # crash after the pending stage but (possibly) before the flip:
        # the replaying run IS the pending generation (its checkpoint
        # identity matches the stage) — keep stamping it and flip on its
        # next committed batch
        generation = pending_gen
        flip_needed = True
    elif pending_gen is not None and pending_ckpt is None and any(
        _manifest_generation(os.path.join(path, d)) == pending_gen
        for d in os.listdir(path)
        if d.startswith("batch=")
    ):
        # upgrade-window migration (round-11 advice): a LEGACY pending
        # file (written before the 'checkpoint' key existed) carries no
        # identity, so it can't be matched to this checkpoint directly.
        # But if batch manifests stamped with pending_gen already exist
        # on disk, the pending stage was this run's — it crashed after a
        # commit and before the flip — and treating it as foreign would
        # silently retire those batches while leaving the prior
        # generation's higher-numbered stale dirs live (duplicate rows on
        # read). Adopt the pending generation and flip on the next commit.
        generation = pending_gen
        flip_needed = True
    else:
        # intact checkpoint: keep the live generation; a legacy sink
        # written before the protocol existed (no file) stays unstamped.
        # A pending file staged by some OTHER run's aborted fresh start
        # is stale here — drop it so it can't be misadopted later.
        if pending_gen is not None:
            os.remove(ppath)
        generation = prev_gen
        flip_needed = False

    def _commit_batch(batch_df, batch_id: int) -> None:
        nonlocal flip_needed
        w = (
            batch_df.write.format("jsonl_manifest")
            .mode("overwrite")
            .option("path", os.path.join(path, f"batch={batch_id}"))
        )
        if generation is not None:
            w = w.option("generation", str(generation))
        w.save()
        if flip_needed:
            # first committed batch of this generation: go live, retire
            # the pending stage
            _write_json_atomic(gpath, {"generation": generation})
            if os.path.exists(ppath):
                os.remove(ppath)
            flip_needed = False

    return (
        stream_df.writeStream.foreachBatch(_commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_all_batches(spark, path: str):
    """Union every LIVE committed batch directory under ``path`` — only
    manifest-committed shards are visible (a crashed batch attempt has
    shards but no manifest), and when a sink-level generation file
    exists, only manifests stamped with the CURRENT generation count
    (stale batch dirs from a prior run whose replay emitted fewer
    micro-batches are skipped — see write_stream_exactly_once)."""
    gpath = os.path.join(path, GENERATION_FILE)
    live_gen = None
    if os.path.exists(gpath):
        with open(gpath) as f:
            live_gen = int(json.load(f)["generation"])
    batches = sorted(
        d for d in os.listdir(path) if d.startswith("batch=")
        and os.path.exists(os.path.join(path, d, MANIFEST))
    )
    frames = []
    manifest_rows = 0
    stale = []
    newer = []
    for b in batches:
        df, manifest = read_manifest(spark, os.path.join(path, b))
        if live_gen is not None and manifest.get("generation") != live_gen:
            mgen = manifest.get("generation")
            (newer if (mgen is not None and mgen > live_gen) else stale).append(b)
            continue
        frames.append(df)
        manifest_rows += manifest["n_rows"]
    if newer:
        # a batch dir carries a stamp NEWER than the live generation:
        # a fresh run has committed its first batch (overwriting this
        # dir's prior-generation manifest) but not yet flipped
        # _GENERATION.json — the prior generation is genuinely no longer
        # complete on disk, so erroring (retryably) is the honest answer
        raise FileNotFoundError(
            f"generation transition in progress under {path}: batches "
            f"{newer} are stamped newer than live generation {live_gen}; "
            "retry after the writer flips the generation file"
        )
    if not frames:
        raise FileNotFoundError(
            f"no committed batches under {path}"
            + (f" for generation {live_gen} ({len(stale)} stale)" if stale else "")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out, manifest_rows
