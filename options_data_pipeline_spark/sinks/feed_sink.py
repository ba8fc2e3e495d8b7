"""Python Data Source streaming SINK with two-phase commit: the
"publish downstream" half of the reference's pipeline (aggregated
candles POSTed / landed for consumers), as a registrable
``writeStream.format("feedsink")``.

Exactly-once discipline over a non-transactional destination, via the
writer commit protocol Spark gives Python sinks:

1. each task writes its partition to an UNCOMMITTED staging file named
   by its globally-unique task attempt id and returns a
   ``WriterCommitMessage`` carrying the staging path + row count;
2. the driver's ``commit(messages, batchId)`` runs only when EVERY task
   succeeded — it promotes the staging files and writes a
   ``_batch-<id>.manifest`` naming them with their counts;
3. ``abort`` removes the staged files, so a failed/retried micro-batch
   leaves nothing visible.

Readers only trust manifested files, so a crash between stage and
commit is invisible — the same manifest-commit pattern the parquet
sinks use for atomic swap, here exposed through the DataSource writer
API. Replayed batches (restart after commit, before the WAL advances)
re-stage under the same batch id and the manifest is rewritten
identically — idempotent because staging names are (batchId, partition)
deterministic.

Options: ``path`` (sink directory). The payload is JSON-lines per file
(a REST POST body per row in production; files here so tests and
air-gapped runs observe exactly what would be sent).
"""

from __future__ import annotations

import dataclasses
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


@dataclasses.dataclass
class _Staged(WriterCommitMessage):
    path: str
    rows: int


class FeedSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "feedsink"

    def streamWriter(self, schema, overwrite: bool) -> "FeedSinkWriter":
        return FeedSinkWriter(self.options, [f.name for f in schema.fields])


class FeedSinkWriter(DataSourceStreamWriter):
    def __init__(self, options: dict, fields: list[str]) -> None:
        self.path = options["path"]
        self.fields = fields

    def write(self, iterator) -> _Staged:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        # taskAttemptId is globally unique -> retried tasks never clash;
        # the batch-scoped FINAL name is assigned at commit time
        staged = os.path.join(
            self.path,
            f".staging-{ctx.taskAttemptId()}-{ctx.partitionId()}.jsonl",
        )
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {f: _jsonable(v) for f, v in zip(self.fields, row)}
                    )
                    + "\n"
                )
                n += 1
        return _Staged(path=staged, rows=n)

    def commit(self, messages, batchId: int) -> None:
        # final names are (batchId, ordinal)-deterministic: a replayed
        # batch overwrites the same files and manifest, so duplicated
        # delivery after a post-commit crash is idempotent
        manifest = []
        for i, m in enumerate(messages):
            if m is None or m.rows == 0:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)
                continue
            final = os.path.join(self.path, f"batch-{batchId}-{i}.jsonl")
            os.replace(m.path, final)
            manifest.append({"file": os.path.basename(final), "rows": m.rows})
        with open(
            os.path.join(self.path, f"_batch-{batchId}.manifest"), "w"
        ) as fh:
            json.dump(manifest, fh)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def _jsonable(v):
    import datetime

    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def read_committed(path: str) -> list[dict]:
    """Reader-side contract: rows from MANIFESTED files only."""
    out: list[dict] = []
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("_batch-") or not entry.endswith(".manifest"):
            continue
        with open(os.path.join(path, entry)) as fh:
            for item in json.load(fh):
                with open(os.path.join(path, item["file"])) as data:
                    out.extend(json.loads(ln) for ln in data)
    return out
