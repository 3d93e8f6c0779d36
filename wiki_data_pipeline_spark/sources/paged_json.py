"""Paged-JSON custom data source (Python Data Source API).

Reads AND writes the K1 one-JSON-file-per-record layout
(``batch_NNN/article_NNNNNN.json`` — sinks/per_record_json.py) as a
real Spark connector — ``spark.read.format("paged_json")`` /
``df.write.format("paged_json")`` — re-expressing the reference's
source/sink machinery:

- **partition planning** (S1, src/mediawiki_client.py:66-112): each
  ``batch_NNN`` directory is one InputPartition — the reference's
  500-rows-per-request page becomes a Spark task; N pages scan with N-way
  parallelism instead of a cursor loop.
- **predicate pushdown to the source** (F1, src/mediawiki_client.py:75
  — ``gapnamespace=0`` inside the API request itself): equality/range
  filters on the virtual ``batch`` column prune WHOLE partitions at
  plan time via ``pushFilters`` — the pruned page is never listed,
  opened, or parsed; the filter is consumed (not re-evaluated by
  Spark).
- **prefix listing** (S9, src/azure_manager.py:107-114): the
  ``prefix`` option restricts which batch directories are planned,
  mirroring the blob-prefix listing scan.
- **per-file JSON parse** (S8, src/azure_manager.py:127-136): each
  task parses only its partition's files; fields are projected in the
  caller's schema order, missing keys → null (schema-on-read).
- **malformed-record tolerance** (src/azure_manager.py:126-136 —
  ``download_blob`` catches the parse failure, logs, and returns
  ``None`` instead of killing the run): the reader takes the native
  JSON source's ``mode`` option — ``PERMISSIVE`` (default; a corrupt
  file becomes a row of nulls, and the raw text lands in the schema's
  ``columnNameOfCorruptRecord`` column when the caller declares one),
  ``DROPMALFORMED`` (skip the file), ``FAILFAST`` (raise). One rotted
  blob among millions must not fail a 100 TB backfill task — and with
  task retries it would fail it four times.

Scale notes: partition planning is O(#directories) metadata work on
the driver (exactly like any file index); all row work is in tasks. At
100 TB the same source shape points at object-store listings — the
Python reader is NOT the bulk-scan fast path (parquet is), it is the
connector story for per-record JSON layouts that Spark's native JSON
reader would read with one task per file (tiny-file death) rather than
one task per directory.

Classes are defined inside a factory so cloudpickle serializes them BY
VALUE — Python workers never import this package (repo rule: worker
closures are self-contained).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def make_paged_json_datasource():
    """Build the DataSource class (pickled by value into workers)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        GreaterThanOrEqual,
        InputPartition,
        LessThanOrEqual,
    )

    class BatchPartition(InputPartition):
        def __init__(self, batch_num: int, batch_dir: str):
            self.batch_num = batch_num
            self.batch_dir = batch_dir

    class PagedJsonReader(DataSourceReader):
        def __init__(self, options, schema):
            self.path = options["path"]
            self.prefix = options.get("prefix", "batch_")
            self.fields = [f.name for f in schema.fields]
            mode = options.get("mode", "PERMISSIVE").upper()
            if mode not in ("PERMISSIVE", "DROPMALFORMED", "FAILFAST"):
                raise ValueError(
                    f"paged_json: unknown mode {mode!r} "
                    "(PERMISSIVE | DROPMALFORMED | FAILFAST)"
                )
            self.mode = mode
            self.corrupt_col = options.get(
                "columnNameOfCorruptRecord", "_corrupt_record"
            )
            self.batch_eq = None
            self.batch_ge = None
            self.batch_le = None

        def pushFilters(self, filters):
            # Consume batch-column predicates (partition pruning at the
            # source — F1's push-into-the-request); everything else is
            # returned for Spark to evaluate post-scan.
            for f in filters:
                is_batch = getattr(f, "attribute", None) == ("batch",)
                if is_batch and isinstance(f, EqualTo):
                    self.batch_eq = int(f.value)
                elif is_batch and isinstance(f, GreaterThanOrEqual):
                    self.batch_ge = int(f.value)
                elif is_batch and isinstance(f, LessThanOrEqual):
                    self.batch_le = int(f.value)
                else:
                    yield f

        def partitions(self):
            import os

            parts = []
            for d in sorted(os.listdir(self.path)):
                full = os.path.join(self.path, d)
                if not (d.startswith(self.prefix) and os.path.isdir(full)):
                    continue
                num = int(d.rsplit("_", 1)[-1])
                if self.batch_eq is not None and num != self.batch_eq:
                    continue
                if self.batch_ge is not None and num < self.batch_ge:
                    continue
                if self.batch_le is not None and num > self.batch_le:
                    continue
                parts.append(BatchPartition(num, full))
            return parts

        def read(self, partition):
            import json
            import os

            if partition is None:  # empty plan → Spark still runs one task
                return
            for fn in sorted(os.listdir(partition.batch_dir)):
                if not fn.endswith(".json"):
                    continue
                full = os.path.join(partition.batch_dir, fn)
                try:
                    with open(full, encoding="utf-8", errors="strict") as f:
                        raw = f.read()
                    rec = json.loads(raw)
                    if not isinstance(rec, dict):
                        raise ValueError("top-level JSON is not an object")
                except (ValueError, UnicodeDecodeError) as e:
                    if self.mode == "FAILFAST":
                        raise ValueError(
                            f"paged_json: malformed record {full}: {e}"
                        ) from e
                    if self.mode == "DROPMALFORMED":
                        continue
                    # PERMISSIVE: nulls for data fields; raw text in the
                    # corrupt-record column iff the caller declared one.
                    with open(
                        full, encoding="utf-8", errors="replace"
                    ) as f:
                        raw = f.read()
                    rec = {self.corrupt_col: raw}
                rec["batch"] = partition.batch_num
                yield tuple(rec.get(k) for k in self.fields)

    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class PagedJsonCommit(WriterCommitMessage):
        def __init__(self, count: int):
            self.count = count

    class PagedJsonWriter(DataSourceWriter):
        """Writer half of the connector (K1 sink as a first-class
        ``df.write.format("paged_json")`` path): rows land at
        ``batch_{id//batch_size:03d}/article_{id:06d}.json`` — paths
        derive from the ``id_col`` option, so task retries and job
        re-runs overwrite identically (ST3 idempotence; a counter
        could not replay). Tasks report row counts as commit
        messages; ``commit`` stamps ``_SUCCESS`` with the total —
        the full write → commit-message → commit/abort protocol."""

        def __init__(self, options, schema):
            self.path = options["path"]
            self.id_col = options.get("id_col", "doc_id")
            self.batch_size = int(options.get("batch_size", "1000"))
            self.indent = int(options.get("indent", "2"))

        def write(self, rows):
            import json
            import os

            count = 0
            for row in rows:
                rec = row.asDict(recursive=True)
                rid = int(rec[self.id_col])
                d = os.path.join(
                    self.path, f"batch_{rid // self.batch_size:03d}"
                )
                os.makedirs(d, exist_ok=True)
                path = os.path.join(d, f"article_{rid:06d}.json")
                tmp = path + ".tmp"
                with open(tmp, "w", encoding="utf-8") as f:
                    f.write(
                        json.dumps(
                            rec,
                            ensure_ascii=False,
                            indent=self.indent,
                            default=str,
                        )
                    )
                os.replace(tmp, path)
                count += 1
            return PagedJsonCommit(count)

        def commit(self, messages):
            import os

            total = sum(m.count for m in messages if m is not None)
            with open(
                os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8"
            ) as f:
                f.write(str(total))

        def abort(self, messages):
            # Idempotent-overwrite sink: partial files are valid JSON at
            # deterministic paths; the retry overwrites them. Absence of
            # _SUCCESS marks the job as uncommitted.
            pass

    class PagedJsonDataSource(DataSource):
        @classmethod
        def name(cls):
            return "paged_json"

        def schema(self):
            # Caller normally supplies .schema(ddl); this default only
            # covers the virtual partition column.
            return "batch int"

        def reader(self, schema):
            return PagedJsonReader(self.options, schema)

        def writer(self, schema, overwrite):
            return PagedJsonWriter(self.options, schema)

    return PagedJsonDataSource


def register(spark: SparkSession) -> None:
    # Python-source filter pushdown is opt-in; the reader owns the conf
    # the same way io.read_table owns its parquet confs.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(make_paged_json_datasource())


def read_paged_json(spark: SparkSession, path: str, schema_ddl: str) -> DataFrame:
    """Read a K1-layout directory; ``schema_ddl`` should include the
    virtual ``batch int`` column to enable source-side pruning."""
    return spark.read.format("paged_json").schema(schema_ddl).load(path)
