"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
a deterministic synthetic-document generator.

This is the §2.1 source-connector surface beyond file formats: the same
API a JDBC-less SaaS connector, a feature store, or a proprietary format
reader would implement. The generator shape was chosen deliberately:

- **partition planning**: `partitions()` returns contiguous doc_id
  ranges, so Spark schedules one generator task per range — the source
  scales out exactly like a file scan (and a real connector returns
  shard/split descriptors here);
- **executor-side reads**: `read(partition)` runs ON the executors;
  the driver only plans. Nothing about the corpus ever materializes
  driver-side;
- **determinism**: rows derive from doc_id via exact integer arithmetic
  (Knuth multiplicative hashing), so the SAME corpus comes back for a
  given (n, partitions) on every engine, run, and cluster size — which
  makes even this source DuckDB-oracle-checkable (see
  `source_synthetic_docs` in operators/extensions.py).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# 20-word vocabulary shared verbatim with the SQL oracle
VOCAB = (
    "spark", "query", "hash", "row", "column", "table", "scan", "merge",
    "sort", "join", "batch", "stream", "key", "value", "part", "agg",
    "window", "fast", "slow", "line",
)
_MULT = 2654435761
_MOD = 4294967296


def synth_word(doc_id: int, i: int) -> str:
    return VOCAB[((doc_id * _MULT + i * 97003) % _MOD) % len(VOCAB)]


def synth_n_words(doc_id: int) -> int:
    return 5 + (doc_id * _MULT) % 7


def _doc_row(doc_id: int) -> tuple:
    """The one definition of a synthetic document row — batch read and
    stream replay MUST build identical tuples or the
    readBetweenOffsets replay-parity guarantee silently breaks."""
    k = synth_n_words(doc_id)
    return (doc_id, " ".join(synth_word(doc_id, i) for i in range(k)), k)



class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsDataSource(DataSource):
    """`spark.read.format("synthetic_documents").option("n", N)`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_documents"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_words int"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.num_partitions = int(options.get("partitions", 4))

    def partitions(self):
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for doc_id in range(partition.start, partition.end):
            yield _doc_row(doc_id)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the same generator — the custom STREAM-source
    contract: offsets are plain dicts the engine checkpoints;
    `read(start)` returns (rows, next offset) for one micro-batch;
    `readBetweenOffsets` replays a committed range exactly (what makes
    recovery after a crash deterministic). A real connector maps offsets
    to Kafka/cursor positions; the replay guarantee is the part that
    buys end-to-end exactly-once with an idempotent sink."""

    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.batch = int(options.get("batch_size", 40))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, lo: int, hi: int) -> list:
        # a LIST, not a generator: the engine pickles the batch so it can
        # cache it for replay between read() and the task execution
        return [_doc_row(doc_id) for doc_id in range(lo, hi)]

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch, self.n)
        return iter(self._rows(lo, hi)), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["next"], end["next"]))
