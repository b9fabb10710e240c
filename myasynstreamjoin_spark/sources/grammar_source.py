"""Custom Python DataSource emitting the reference's Kafka text grammar.

The reference ingests packed text messages `"ts port word;ts port
word;…"` from Kafka (S1, stateless/cluster/HashJoin.scala:64-66); the
container has no broker, so this source provides the same wire format
as a first-class `spark.read.format("ref_grammar")` / `readStream`
source (PySpark 4 DataSource API). Records are deterministic
(seeded per partition), so tests can assert exact aggregates, and the
batch and streaming readers emit identical data — the
streaming-batch-equivalence property the engine's whole test strategy
leans on.

Envelope mirrors Kafka: (partition INT, offset BIGINT, value STRING);
`sources.fixtures.decode_packed_lines` parses `value` into F1 rows.

Scale notes: BOTH readers fan out one InputPartition per configured
partition and generate ON THE EXECUTORS — the streaming side is a full
``DataSourceStreamReader`` (driver plans offset ranges; executors
read), the same shape a production partitioned source uses. Nothing
rows through the driver.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

DEFAULT_KEYS = "A,B,C,D,E,F"  # stream.json:11 demo key space


def _records(seed: int, part: int, offset: int, n_msgs: int,
             recs_per_msg: int, n_ports: int, keys: list[str],
             lgw_ms: int) -> list[tuple[int, int, str]]:
    """Deterministic packed messages for one (partition, offset) range:
    timestamps advance lgw_ms/recs_per_msg per record so every window
    receives records from every port (the async-join completeness path
    is exercised, not starved)."""
    out = []
    for m in range(n_msgs):
        # key choice is a PER-RECORD md5 of "seed:part:msg:rec" — no
        # sequential RNG state, so (a) any chunking of the offset range
        # (one batch read vs N micro-batches) emits identical records
        # (batch/stream equivalence is asserted in tests), and (b) the
        # expected aggregate is replayable by an external SQL oracle
        # (DuckDB md5 over the same strings — see q_grammar_ingest's
        # oracle), closing the driver's rows-only gap on this source.
        base_ts = (offset + m) * lgw_ms
        recs = []
        for r in range(recs_per_msg):
            ts = base_ts + (r * lgw_ms) // recs_per_msg
            port = (part + r) % n_ports
            h = int(
                hashlib.md5(
                    f"{seed}:{part}:{offset + m}:{r}".encode()
                ).hexdigest()[:8],
                16,
            )
            word = keys[h % len(keys)]
            recs.append(f"{ts} {port} {word}")
        out.append((part, offset + m, ";".join(recs)))
    return out


class _GrammarPartition(InputPartition):
    def __init__(self, part: int):
        self.part = part


class GrammarBatchReader(DataSourceReader):
    def __init__(self, options):
        self.opts = options

    def partitions(self):
        return [
            _GrammarPartition(p)
            for p in range(int(self.opts.get("partitions", "2")))
        ]

    def read(self, partition: _GrammarPartition):
        o = self.opts
        yield from _records(
            seed=int(o.get("seed", "42")),
            part=partition.part,
            offset=0,
            n_msgs=int(o.get("messages", "100")),
            recs_per_msg=int(o.get("records_per_message", "8")),
            n_ports=int(o.get("ports", "3")),
            keys=o.get("keys", DEFAULT_KEYS).split(","),
            lgw_ms=int(o.get("lgw_ms", "1000")),
        )


class _GrammarRange(InputPartition):
    def __init__(self, part: int, begin: int, end: int):
        self.part = part
        self.begin = begin
        self.end = end


class GrammarStreamReader(DataSourceStreamReader):
    """Partitioned micro-batched replay of the SAME records the batch
    reader emits: each trigger advances the virtual head by
    ``messages_per_batch`` until ``messages`` is exhausted, then
    returns empty batches — a finite stream whose union of outputs
    equals the batch read exactly.

    Full (non-Simple) stream reader: ``partitions(start, end)`` plans
    one InputPartition per configured source partition and ``read``
    runs ON THE EXECUTORS — per-partition offsets and distributed
    generation, the production source shape (the earlier
    SimpleDataSourceStreamReader funneled every record through the
    driver).

    Restart safety: the in-memory head resets with the reader, so after
    a checkpoint restart Spark can hand this reader a START offset
    ahead of anything it has generated, and later batches can carry a
    STALE start (the empty post-restart batch's logged end). A
    monotone committed-floor — raised by every ``partitions`` start and
    every ``commit`` — clamps generation: ``begin = max(start, floor)``
    never re-emits a committed message and never skips an uncommitted
    replay (a replayed batch's start equals its original start, which
    is ≥ every committed offset). Exactly-once replay is asserted by
    ``tests/test_grammar_source.py::test_stream_restart_no_duplicates``.
    """

    def __init__(self, options):
        self.opts = options
        self._head = 0
        self._floor = 0  # highest offset known committed / planned-from

    def initialOffset(self):
        return {"msg": 0}

    def latestOffset(self):
        total = int(self.opts.get("messages", "100"))
        per_batch = int(self.opts.get("messages_per_batch", "25"))
        self._head = min(max(self._head, self._floor) + per_batch, total)
        return {"msg": self._head}

    def partitions(self, start: dict, end: dict):
        self._floor = max(self._floor, start["msg"])
        begin = max(start["msg"], self._floor)
        stop = max(end["msg"], begin)
        if stop <= begin:
            return [_GrammarRange(0, begin, begin)]  # empty batch
        return [
            _GrammarRange(p, begin, stop)
            for p in range(int(self.opts.get("partitions", "2")))
        ]

    def read(self, partition: _GrammarRange):
        o = self.opts
        yield from _records(
            seed=int(o.get("seed", "42")),
            part=partition.part,
            offset=partition.begin,
            n_msgs=partition.end - partition.begin,
            recs_per_msg=int(o.get("records_per_message", "8")),
            n_ports=int(o.get("ports", "3")),
            keys=o.get("keys", DEFAULT_KEYS).split(","),
            lgw_ms=int(o.get("lgw_ms", "1000")),
        )

    def commit(self, end: dict) -> None:
        self._floor = max(self._floor, end["msg"])
        self._head = max(self._head, end["msg"])


class GrammarDataSource(DataSource):
    """`format("ref_grammar")`: the reference's Kafka wire format as a
    native batch + streaming source."""

    @classmethod
    def name(cls):
        return "ref_grammar"

    def schema(self):
        return "partition INT, offset BIGINT, value STRING"

    def reader(self, schema):
        return GrammarBatchReader(self.options)

    def streamReader(self, schema):
        return GrammarStreamReader(self.options)


def register_grammar_source(spark) -> None:
    spark.dataSource.register(GrammarDataSource)
