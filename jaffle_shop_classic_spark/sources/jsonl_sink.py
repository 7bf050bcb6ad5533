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
   shards. Readers resolve the manifest first, so orphan shards from
   failed/speculative attempts are invisible — rename-free atomicity on
   stores without atomic rename;
3. `abort()` runs on failure and leaves no manifest — the write never
   happened as far as readers are concerned.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"


@dataclass
class ShardCommit(WriterCommitMessage):
    path: str
    n_rows: int


class JsonlManifestDataSource(DataSource):
    """`df.write.format("jsonl_manifest").save(path)`."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool) -> "JsonlManifestWriter":
        return JsonlManifestWriter(self.options)


class JsonlManifestWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator) -> ShardCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(
            self.path,
            f"part-{ctx.partitionId():05d}-{uuid.uuid4().hex}.jsonl",
        )
        n = 0
        with open(shard, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return ShardCommit(path=shard, n_rows=n)

    def commit(self, messages) -> None:
        manifest = {
            "shards": [
                {"path": m.path, "n_rows": m.n_rows} for m in messages
            ],
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1)

    def abort(self, messages) -> None:  # pragma: no cover — failure path
        # no manifest => the write never happened for readers; orphan
        # shards are garbage-collected out of band
        pass


def read_manifest(spark, path: str):
    """Manifest-resolved read-back: only committed shards are visible."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    shard_paths = [s["path"] for s in manifest["shards"]]
    return spark.read.json(shard_paths), manifest
