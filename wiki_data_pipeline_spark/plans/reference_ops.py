"""Reference row-pipeline operators as Spark queries (SURVEY.md §2, Phase 1).

The ``documents`` table plays the article corpus (FIXTURES.md §B):
``text`` ≡ article content, ``source`` ≡ fetch source tag, ``n_chars``
≡ precomputed content length.

Determinism rules (driver hash-matches values):
- no ``current_timestamp()`` — timestamps, when needed, are literals;
- every count/length cast to BIGINT (Spark length() is INT, DuckDB's
  is BIGINT);
- double aggregates go through exact decimal sums (see star_schema.py);
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wiki_data_pipeline_spark.functions.text import (
    WIKI_BASE_URL,
    build_url,
    clean_categories,
    clean_whitespace,
    is_valid_content,
    line_count,
    word_count,
)
from wiki_data_pipeline_spark.io import read_table
from wiki_data_pipeline_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Flagship (Phase 0): A2/A7 corpus summary grouped by source.
# ---------------------------------------------------------------------------


@query(
    "a2_summary_by_source",
    oracle="""
    SELECT
      source,
      count(*)                                        AS n_docs,
      CAST(sum(length(text)) AS BIGINT)               AS total_chars,
      CAST(sum(length(text)) AS DOUBLE) / count(*)    AS avg_chars,
      CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS total_words,
      count(DISTINCT lang)                            AS n_langs
    FROM documents
    WHERE text IS NOT NULL AND length(trim(text)) >= 1
    GROUP BY source
    """,
)
def a2_summary_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus summary (reference A2 create_summary,
    src/production_data_processor.py:135-167; per-source counts :150-153).

    validate-filter (F7) → project → hash aggregate. Map-side partial
    aggregation + AQE handle the shuffle; at 100 TB this is a single
    shuffle on a low-cardinality key — no skew concern because partial
    aggs collapse each partition to ~n_sources rows before exchange.
    """
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.filter(is_valid_content("text"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
            (
                F.sum(F.length("text")).cast("double") / F.count("*")
            ).alias("avg_chars"),
            F.sum(word_count("text")).cast("bigint").alias("total_words"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# ---------------------------------------------------------------------------
# T1/T2 — normalize/project the canonical article record.
# ---------------------------------------------------------------------------


@query(
    "t1_normalize_project",
    oracle=f"""
    SELECT
      doc_id,
      'Doc ' || doc_id                                   AS title,
      '{WIKI_BASE_URL}' || replace('Doc ' || doc_id, ' ', '_') AS url,
      text                                               AS content,
      NULL::VARCHAR                                      AS author,
      CAST(length(text) AS BIGINT)                       AS content_length,
      CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS word_count,
      lang, source
    FROM documents
    WHERE text IS NOT NULL AND length(trim(text)) >= 1
    """,
)
def t1_normalize_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize/project into the canonical article shape (reference T1/T2
    process_article, src/data_processor.py:8-46 and
    src/production_data_processor.py:9-61): select + derived metrics +
    constant ``author`` (always NULL in the reference,
    src/mediawiki_client.py:169). ``processing_timestamp`` is
    deliberately omitted in query mode for determinism (SURVEY.md §7
    risk 5); the batch writer stamps it at sink time.

    Narrow transform — no shuffle; scales linearly with input splits.
    """
    docs = read_table(spark, sf_dir, "documents")
    title = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
    return docs.filter(is_valid_content("text")).select(
        "doc_id",
        title.alias("title"),
        build_url(title).alias("url"),
        F.col("text").alias("content"),
        F.lit(None).cast("string").alias("author"),
        F.length("text").cast("bigint").alias("content_length"),
        word_count("text").cast("bigint").alias("word_count"),
        "lang",
        "source",
    )


# ---------------------------------------------------------------------------
# T3 — whitespace normalization.
# ---------------------------------------------------------------------------


@query(
    "t3_whitespace_clean",
    oracle="""
    SELECT
      doc_id,
      trim(regexp_replace(text, '\\s+', ' ', 'g')) AS cleaned,
      CAST(length(text) - length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS BIGINT)
        AS chars_removed
    FROM documents
    """,
)
def t3_whitespace_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse whitespace runs (reference T3 clean_content,
    src/data_processor.py:58-66: ``' '.join(s.split())``).
    Pure narrow projection, whole-stage codegen, no shuffle."""
    docs = read_table(spark, sf_dir, "documents")
    cleaned = clean_whitespace("text")
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned"),
        (F.length("text") - F.length(cleaned)).cast("bigint").alias("chars_removed"),
    )


# ---------------------------------------------------------------------------
# T4 — category array cleaning via higher-order functions.
# ---------------------------------------------------------------------------


@query(
    "t4_clean_categories",
    oracle="""
    SELECT
      doc_id,
      array_to_string(
        list_filter(
          list_transform(
            ['Category:' || lang, 'Category:  ' || source, '  ', 'Plain'],
            x -> trim(regexp_replace(x, '^Category:', ''))),
          x -> x <> ''),
        '|')                                AS categories,
      CAST(len(list_filter(
        list_transform(
          ['Category:' || lang, 'Category:  ' || source, '  ', 'Plain'],
          x -> trim(regexp_replace(x, '^Category:', ''))),
        x -> x <> '')) AS BIGINT)           AS category_count
    FROM documents
    """,
)
def t4_clean_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array cleaning (reference T4 extract_categories,
    src/data_processor.py:68-83): strip ``Category:`` prefix, trim,
    drop empties — via transform/filter higher-order functions, never a
    Python UDF. The synthetic category array is derived on the fly
    (documents have no category column; FIXTURES.md §B mapping).

    The cleaned array is emitted in canonical scalar form
    (``array_join(cats, '|')``) so downstream comparators can hash the
    column; ``category_count`` preserves the array-length semantics."""
    docs = read_table(spark, sf_dir, "documents")
    raw = F.array(
        F.concat(F.lit("Category:"), F.col("lang")),
        F.concat(F.lit("Category:  "), F.col("source")),
        F.lit("  "),
        F.lit("Plain"),
    )
    cats = clean_categories(raw)
    return docs.select(
        "doc_id",
        F.array_join(cats, "|").alias("categories"),
        F.size(cats).cast("bigint").alias("category_count"),
    )


# ---------------------------------------------------------------------------
# T5 — canonical JSON serialization.
# ---------------------------------------------------------------------------


@query(
    "t5_to_json",
    oracle="""
    SELECT
      doc_id,
      to_json(struct_pack(doc_id := doc_id, lang := lang, source := source,
                          n_chars := n_chars))::VARCHAR AS record_json
    FROM documents
    """,
)
def t5_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row → compact JSON string (reference T5 format_for_storage,
    src/data_processor.py:85-103). The reference pretty-prints at the
    file boundary; the canonical in-engine form is compact ``to_json``
    (pretty-printing is a sink concern, sinks/per_record_json.py)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        # nulls serialized explicitly ("n_chars": null), matching the
        # SQL to_json convention — Spark's default silently drops null
        # fields, which changes the record SCHEMA row-to-row
        F.to_json(
            F.struct("doc_id", "lang", "source", "n_chars"),
            {"ignoreNullFields": "false"},
        ).alias("record_json"),
    )


# ---------------------------------------------------------------------------
# T7 — text statistics.
# ---------------------------------------------------------------------------


@query(
    "t7_text_stats",
    oracle="""
    SELECT
      doc_id,
      CAST(length(text) AS BIGINT)                                AS character_count,
      CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS word_count,
      CAST(len(string_split(text, chr(10))) AS BIGINT)            AS line_count,
      length(trim(text)) > 0                                      AS has_content,
      length(text) = n_chars                                      AS n_chars_consistent
    FROM documents
    """,
)
def t7_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived text statistics (reference T7 extract_structured_data,
    src/production_data_processor.py:169-182). ``n_chars_consistent``
    cross-checks the fixture's precomputed length (FIXTURES.md §B)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("character_count"),
        word_count("text").cast("bigint").alias("word_count"),
        line_count("text").cast("bigint").alias("line_count"),
        (F.length(F.trim(F.col("text"))) > 0).alias("has_content"),
        (F.length("text") == F.col("n_chars")).alias("n_chars_consistent"),
    )


# ---------------------------------------------------------------------------
# F1–F7 — the filter pipeline.
# ---------------------------------------------------------------------------


@query(
    "f_filter_pipeline",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE doc_id >= 0                          -- F2 invalid-page sentinel
      AND lower(text) NOT LIKE '#redirect%'    -- F4 redirect-by-content
      AND text IS NOT NULL AND length(trim(text)) >= 1   -- F7 validation
      AND lang = 'en'                          -- F1 namespace analog
    """,
)
def f_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stacked filter predicates F1/F2/F4/F7 (reference
    src/mediawiki_client.py:91-92,150-151, src/data_processor.py:48-56).
    All plain predicates → Catalyst collapses them into one scan filter
    and pushes them to the parquet reader (PushedFilters) — at 100 TB
    this is the difference between scanning 100 TB and scanning the
    matching row groups only."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") >= 0)
        .filter(~F.lower(F.col("text")).startswith("#redirect"))
        .filter(is_valid_content("text"))
        .filter(F.col("lang") == "en")
        .select("doc_id", "lang", "source", "n_chars")
    )


# ---------------------------------------------------------------------------
# F9/J2 — dedup-on-insert as an anti-join.
# ---------------------------------------------------------------------------


@query(
    "f9_dedup_anti_join",
    oracle="""
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE d.doc_id >= 200
      AND NOT EXISTS (SELECT 1 FROM documents s
                      WHERE s.doc_id < 250 AND s.doc_id = d.doc_id)
    """,
)
def f9_dedup_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seen-set exclusion (reference F9/J2 add_articles,
    src/queue_manager.py:52-58). The reference's O(n²) list-membership
    scan becomes a hash anti-join — O(n) with a single shuffle, and
    broadcastable when the seen-set is small. ``incoming`` = docs
    200+, ``seen`` = docs <250; survivors are 250+."""
    docs = read_table(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("doc_id") >= 200)
    seen = docs.filter(F.col("doc_id") < 250).select("doc_id")
    return incoming.join(seen, on="doc_id", how="left_anti").select("doc_id", "source")


# ---------------------------------------------------------------------------
# A1 — global corpus summary.
# ---------------------------------------------------------------------------


@query(
    "a1_corpus_summary",
    oracle="""
    SELECT
      count(*)                                     AS total_articles,
      CAST(sum(length(text)) AS BIGINT)            AS total_content_length,
      CAST(sum(length(text)) AS DOUBLE) / count(*) AS average_content_length,
      CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS total_words,
      count(DISTINCT lang)                         AS unique_langs,
      count(DISTINCT source)                       AS unique_sources,
      CAST(max(length(text)) AS BIGINT)            AS max_content_length,
      CAST(min(length(text)) AS BIGINT)            AS min_content_length
    FROM documents
    WHERE text IS NOT NULL AND length(trim(text)) >= 1
    """,
)
def a1_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global corpus summary (reference A1 create_summary,
    src/data_processor.py:121-140, zero-guard included via the
    validate filter). Single global aggregate: partial aggregation
    reduces each partition to one row before the 1-row exchange —
    scales to any input size."""
    docs = read_table(spark, sf_dir, "documents").filter(is_valid_content("text"))
    return docs.agg(
        F.count("*").alias("total_articles"),
        F.sum(F.length("text")).cast("bigint").alias("total_content_length"),
        (F.sum(F.length("text")).cast("double") / F.count("*")).alias(
            "average_content_length"
        ),
        F.sum(word_count("text")).cast("bigint").alias("total_words"),
        F.countDistinct("lang").alias("unique_langs"),
        F.countDistinct("source").alias("unique_sources"),
        F.max(F.length("text")).cast("bigint").alias("max_content_length"),
        F.min(F.length("text")).cast("bigint").alias("min_content_length"),
    )


# ---------------------------------------------------------------------------
# L3/L4 + T9 — global row indexing, fixed-size batching, filename format.
# ---------------------------------------------------------------------------


@query(
    "l4_batch_index",
    oracle="""
    SELECT
      doc_id,
      row_number() OVER (ORDER BY doc_id) - 1               AS file_index,
      (row_number() OVER (ORDER BY doc_id) - 1) // 100      AS batch_id,
      printf('batch_%03d/article_%06d.json',
             (row_number() OVER (ORDER BY doc_id) - 1) // 100,
             row_number() OVER (ORDER BY doc_id) - 1)       AS blob_path
    FROM documents
    """,
)
def l4_batch_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive global file indexing + fixed-size batching + path
    formatting (reference L3/L4/T9: src/azure_manager.py:37-44,66-67;
    src/main.py:137-142). ``row_number`` over a global ORDER BY is a
    single-partition sort — fine at fixture scale, and the one operator
    we deliberately flag as NOT 100 TB-safe in this form; the scalable
    variant (per-partition offsets via zipWithIndex-style two-pass) is
    sinks/per_record_json.py (SURVEY.md §4 note on L3)."""
    docs = read_table(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id")
    idx = (F.row_number().over(w) - 1).cast("bigint")
    batch = F.floor(idx / 100).cast("bigint")
    return docs.select(
        "doc_id",
        idx.alias("file_index"),
        batch.alias("batch_id"),
        F.format_string("batch_%03d/article_%06d.json", batch, idx).alias("blob_path"),
    )


# ---------------------------------------------------------------------------
# L1 + ordering — top-k documents.
# ---------------------------------------------------------------------------


@query(
    "l1_topk_documents",
    oracle="""
    SELECT doc_id, n_chars, lang
    FROM documents
    ORDER BY n_chars DESC, doc_id
    LIMIT 10
    """,
)
def l1_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by size (reference L1 limit-early-exit,
    src/mediawiki_client.py:101-102, generalized to ordered top-k).
    Spark compiles orderBy+limit into TakeOrderedAndProject — per
    -partition heap + driver merge of k rows, no global sort. Ties
    broken by doc_id for determinism."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .limit(10)
        .select("doc_id", "n_chars", "lang")
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY.md §2.7).
# ---------------------------------------------------------------------------


@query(
    "set_ops_union_except",
    oracle="""
    WITH en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
         big AS (SELECT doc_id FROM documents WHERE n_chars > 300)
    SELECT 'union' AS op, count(*) AS n FROM (SELECT doc_id FROM en UNION SELECT doc_id FROM big)
    UNION ALL
    SELECT 'intersect' AS op, count(*) AS n FROM (SELECT doc_id FROM en INTERSECT SELECT doc_id FROM big)
    UNION ALL
    SELECT 'except' AS op, count(*) AS n FROM (SELECT doc_id FROM en EXCEPT SELECT doc_id FROM big)
    """,
)
def set_ops_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations over document id-sets (reference §2.7: implicit
    union of per-source fetch results + anti-join except-semantics).
    union/intersect/except are native Spark set operators."""
    docs = read_table(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en").select("doc_id")
    big = docs.filter(F.col("n_chars") > 300).select("doc_id")
    u = en.union(big).distinct().agg(F.count("*").alias("n")).select(F.lit("union").alias("op"), "n")
    i = en.intersect(big).agg(F.count("*").alias("n")).select(F.lit("intersect").alias("op"), "n")
    e = en.exceptAll(big.distinct()).distinct().agg(F.count("*").alias("n")).select(
        F.lit("except").alias("op"), "n"
    )
    return u.unionAll(i).unionAll(e)


# ---------------------------------------------------------------------------
# T6 — wikitext → plain text (JVM regex form; pandas_udf form in
# functions/wikitext.py for the genuine wikitextparser path).
# ---------------------------------------------------------------------------


@query(
    "t6_wikitext_strip",
    oracle=r"""
    WITH marked AS (
      SELECT doc_id,
        '[[' || lang || '|' || source || ']] ' || text || ' [[See Also]]' AS wikitext
      FROM documents
    )
    SELECT doc_id, wikitext,
      regexp_replace(wikitext, '\[\[(?:[^\]|]*\|)?([^\]]*)\]\]', '\1', 'g')
        AS plain_text
    FROM marked
    """,
)
def t6_wikitext_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wikitext → plain text (reference T6,
    src/production_mediawiki_client.py:106-118: wikitextparser.parse →
    plain_text, with null-safe fallback). This is the SQL-expressible
    core — [[link|label]] → label — kept JVM-side; the full parser
    variant is a pandas_udf behind an import gate
    (functions/wikitext.py), per SURVEY.md Phase 4(c). Markup is
    synthesized since fixture docs carry none."""
    docs = read_table(spark, sf_dir, "documents")
    wikitext = F.concat(
        F.lit("[["), F.col("lang"), F.lit("|"), F.col("source"), F.lit("]] "),
        F.col("text"), F.lit(" [[See Also]]"),
    )
    return docs.select(
        "doc_id",
        wikitext.alias("wikitext"),
        F.regexp_replace(
            wikitext, r"\[\[(?:[^\]|]*\|)?([^\]]*)\]\]", "$1"
        ).alias("plain_text"),
    )


# ---------------------------------------------------------------------------
# T10 — timestamp → ISO-8601 string.
# ---------------------------------------------------------------------------


@query(
    "t10_timestamp_format",
    oracle="""
    SELECT event_id,
      strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts,
      strftime(ts, '%Y-%m-%d')           AS event_date,
      CAST(date_part('hour', ts) AS BIGINT) AS event_hour
    FROM events WHERE event_id < 100
    """,
)
def t10_timestamp_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 timestamp formatting (reference T10 _format_timestamp,
    src/production_mediawiki_client.py:162-172 — every timestamp the
    reference carries is an ISO string; here typed timestamps are the
    internal form and strings only appear at the boundary)."""
    events = read_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") < 100).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("iso_ts"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.hour("ts").cast("bigint").alias("event_hour"),
    )


# ---------------------------------------------------------------------------
# A3/A5 — work-queue status counts + progress percentage.
# ---------------------------------------------------------------------------


@query(
    "a3_status_counts",
    oracle="""
    SELECT status, count(*) AS n FROM (
      SELECT CASE
        WHEN n_chars < 100 THEN 'failed'
        WHEN doc_id <= 300 THEN 'processed'
        ELSE 'queued' END AS status
      FROM documents)
    GROUP BY status
    """,
)
def a3_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work-queue status aggregation (reference A3 get_queue_status,
    src/queue_manager.py:86-114: queue/processed/failed counts). The
    three lists become one status column over a work-items table —
    groupBy(status) instead of three len() calls on driver lists."""
    docs = read_table(spark, sf_dir, "documents")
    status = (
        F.when(F.col("n_chars") < 100, F.lit("failed"))
        .when(F.col("doc_id") <= 300, F.lit("processed"))
        .otherwise(F.lit("queued"))
    )
    return docs.select(status.alias("status")).groupBy("status").agg(
        F.count("*").alias("n")
    )


@query(
    "a5_progress_pct",
    oracle="""
    SELECT
      count(*) AS total,
      CAST(sum(CASE WHEN event_id <= 500 THEN 1 ELSE 0 END) AS BIGINT) AS processed,
      CAST(sum(CASE WHEN event_id <= 500 THEN 1 ELSE 0 END) AS DOUBLE) * 100
        / count(*) AS progress_pct
    FROM events
    """,
)
def a5_progress_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progress percentage (reference A5,
    src/checkpoint_manager.py:140-146: processed/total×100 with a
    zero-guard). try_divide IS the zero-guard: a global agg emits one
    row even for an EMPTY scan, where count(*)=0 would
    DIVIDE_BY_ZERO-crash under Spark 4's ANSI mode while DuckDB NULLs
    — try_divide makes both engines read NULL progress on nothing."""
    events = read_table(spark, sf_dir, "events")
    processed = F.sum(F.when(F.col("event_id") <= 500, 1).otherwise(0))
    return events.agg(
        F.count("*").alias("total"),
        processed.cast("bigint").alias("processed"),
        F.try_divide(processed.cast("double") * 100, F.count("*")).alias(
            "progress_pct"
        ),
    )


# ---------------------------------------------------------------------------
# L2 — FIFO processing order.
# ---------------------------------------------------------------------------


@query(
    "l2_fifo_head",
    oracle="""
    SELECT event_id, event_type,
      row_number() OVER (ORDER BY event_id) AS dequeue_seq
    FROM events ORDER BY event_id LIMIT 20
    """,
)
def l2_fifo_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO dequeue order (reference L2, src/queue_manager.py:66-72:
    ``queue.pop(0)``). Insertion order ≡ ordering by the enqueue
    sequence column; the head-of-queue peek is orderBy+limit.

    The LIMIT sits BELOW the row_number window (r13, window audit):
    taking the 20 smallest event_ids first (TakeOrderedAndProject — a
    per-partition top-k, never a global sort) and numbering only
    those is equivalent to numbering everything and keeping the first
    20 — row_number over ORDER BY event_id assigns 1..20 to exactly
    the 20 smallest ids either way — but the window's single-partition
    frame is then 20 rows by construction instead of the whole queue,
    which is the difference between a peek and a corpus sort at
    100 TB.

    NOTE: Spark still logs ``WARN WindowExec: No Partition Defined``
    for this plan — that warning is generic to any partition-less
    window and cannot see the 20-row bound. It is expected and safe
    here (SCALE.md "Ordering, top-k, global indexing" documents it for
    operators reading driver logs); the plan audit asserts the bound
    instead of muting the logger."""
    events = read_table(spark, sf_dir, "events")
    head = (
        events.select("event_id", "event_type").orderBy("event_id").limit(20)
    )
    w = Window.orderBy("event_id")
    return head.select(
        "event_id", "event_type", F.row_number().over(w).alias("dequeue_seq")
    )


# ---------------------------------------------------------------------------
# S5 — multi-format fetch dispatch as column selection.
# ---------------------------------------------------------------------------


@query(
    "s5_format_dispatch",
    oracle="""
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 'wikitext' WHEN 1 THEN 'html' ELSE 'plain' END
        AS format,
      CASE doc_id % 3
        WHEN 0 THEN '[[' || substr(text, 1, 40) || ']]'
        WHEN 1 THEN '<p>' || substr(text, 1, 40) || '</p>'
        ELSE substr(text, 1, 40) END AS content
    FROM documents
    """,
)
def s5_format_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format fetch dispatch (reference S5,
    src/enhanced_mediawiki_client.py:93-102: route to wikitext/html/
    plain fetcher by format literal). In columnar form the three
    fetchers are three derived columns and dispatch is a CASE — no
    branching control flow, one scan."""
    docs = read_table(spark, sf_dir, "documents")
    fmt = F.col("doc_id") % 3
    head = F.substring("text", 1, 40)
    return docs.select(
        "doc_id",
        F.when(fmt == 0, F.lit("wikitext"))
        .when(fmt == 1, F.lit("html"))
        .otherwise(F.lit("plain"))
        .alias("format"),
        F.when(fmt == 0, F.concat(F.lit("[["), head, F.lit("]]")))
        .when(fmt == 1, F.concat(F.lit("<p>"), head, F.lit("</p>")))
        .otherwise(head)
        .alias("content"),
    )


# ---------------------------------------------------------------------------
# S9 — scan provenance (blob listing analog).
# ---------------------------------------------------------------------------


@query(
    "s9_file_provenance",
    oracle="""
    SELECT doc_id, 'documents.parquet' AS source_file FROM documents
    WHERE doc_id < 50
    """,
)
def s9_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan provenance via input_file_name() (reference S9 list_blobs,
    src/azure_manager.py:107-114 — the blob listing is the file-level
    catalog; per-row provenance is the lineage version of it). At
    scale, provenance supports selective reprocessing (delete/rewrite
    by source file)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("source_file"),
    )


# ---------------------------------------------------------------------------
# J2 — semi-join (the positive twin of F9's anti-join).
# ---------------------------------------------------------------------------


@query(
    "j2_semi_join",
    oracle="""
    SELECT d.doc_id, d.lang FROM documents d
    WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = d.doc_id)
    """,
)
def j2_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: keep documents whose id appears as an events user
    (reference J2 family, src/queue_manager.py:55 — membership tests
    against a seen-set; F9 shows the anti side, this is the semi
    side). left_semi never duplicates rows from the probe side."""
    docs = read_table(spark, sf_dir, "documents")
    events = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("doc_id")
    )
    return docs.join(events, on="doc_id", how="left_semi").select("doc_id", "lang")


# ---------------------------------------------------------------------------
# T2 — production normalize/project (wider record + nested metadata).
# ---------------------------------------------------------------------------


@query(
    "t2_production_project",
    oracle=f"""
    SELECT
      doc_id,
      'Doc ' || doc_id AS title,
      '{WIKI_BASE_URL}' || replace('Doc ' || doc_id, ' ', '_') AS url,
      text AS content,
      trim(regexp_replace(text, '\\s+', ' ', 'g')) AS plain_text,
      source,
      to_json(struct_pack(
        content_length    := CAST(length(text) AS BIGINT),
        plain_text_length := CAST(length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS BIGINT),
        word_count        := CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT),
        source            := source,
        has_content       := length(text) > 0
      )) AS metadata
    FROM documents
    WHERE text IS NOT NULL AND length(trim(text)) >= 1
    """,
)
def t2_production_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production normalize/project (reference T2,
    src/production_data_processor.py:9-61): the T1 record widened with
    ``plain_text`` pass-through and a nested ``metadata`` struct
    (content/plain lengths, word count, source tag T11, boolean flags
    per T7 extract_structured_data :169-182). The struct is carried as
    its canonical JSON rendering so both engines hash identical bytes;
    in the engine proper it stays a typed StructType column.

    Narrow projection — no shuffle; the struct is computed once per row
    inside whole-stage codegen."""
    docs = read_table(spark, sf_dir, "documents")
    title = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
    plain = clean_whitespace("text")
    meta = F.struct(
        F.length("text").cast("bigint").alias("content_length"),
        F.length(plain).cast("bigint").alias("plain_text_length"),
        word_count("text").cast("bigint").alias("word_count"),
        F.col("source").alias("source"),
        (F.length("text") > 0).alias("has_content"),
    )
    return docs.filter(is_valid_content("text")).select(
        "doc_id",
        title.alias("title"),
        build_url(title).alias("url"),
        F.col("text").alias("content"),
        plain.alias("plain_text"),
        "source",
        F.to_json(meta).alias("metadata"),
    )


# ---------------------------------------------------------------------------
# L3 — scalable global consecutive index (two-pass, no global window).
# ---------------------------------------------------------------------------


@query(
    "l3_global_index_scalable",
    oracle="""
    SELECT doc_id,
      CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS global_idx
    FROM documents
    """,
)
def l3_global_index_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Globally consecutive 0-based index WITHOUT a single-partition
    window (reference L3 consecutive file indices,
    src/azure_manager.py:66-67; SURVEY.md §4 flags the naive
    ``row_number()`` form as not 100 TB-safe — this is the scale-safe
    variant l4_batch_index's docstring promises).

    Two-pass zipWithIndex pattern, DataFrame-native:
      1. range-partition by the order key (distributed sort);
      2. count rows per partition (tiny job: one row per partition);
      3. cumulative offsets broadcast back; final index =
         partition offset + intra-partition rank.
    The per-partition window sorts locally in parallel; the only
    driver-side state is #partitions integers. Range partitioning's
    sampler is seeded deterministically, so both passes see identical
    boundaries. The composition is operators/packing.py
    with_global_offsets (size=None → every row weighs 1, so the
    exclusive prefix sum IS the 0-based index; fuzzed cross-engine in
    tests/test_pack_fuzz.py)."""
    from wiki_data_pipeline_spark.operators.packing import with_global_offsets

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    return with_global_offsets(docs, order="doc_id", out="global_idx").select(
        "doc_id", "global_idx"
    )


# ---------------------------------------------------------------------------
# Data-quality constraint checks (F7 generalized to a quality gate).
# ---------------------------------------------------------------------------


@query(
    "quality_constraint_checks",
    oracle="""
    SELECT
      count(*)                                          AS n_rows,
      CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_doc_id,
      CAST(sum(CASE WHEN text IS NULL OR length(trim(text)) = 0
                    THEN 1 ELSE 0 END) AS BIGINT)       AS empty_text,
      count(DISTINCT doc_id)                            AS distinct_doc_id,
      CAST(count(DISTINCT doc_id) = count(*) AS BOOLEAN) AS doc_id_unique,
      CAST(min(n_chars) AS BIGINT)                      AS min_chars,
      CAST(max(n_chars) AS BIGINT)                      AS max_chars,
      CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT)
                                                        AS n_chars_mismatch,
      CAST(sum(CASE WHEN lang IN ('en','de','fr','es','zz') THEN 0 ELSE 1 END) AS BIGINT)
                                                        AS lang_out_of_domain
    FROM documents
    """,
)
def quality_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (reference F7 validation generalized to a
    declarative constraint suite — the deequ-style pre-training check):
    completeness (null/empty counts), uniqueness (key cardinality vs
    rows), consistency (n_chars must equal length(text)), and domain
    membership, all in ONE aggregation pass over the table. At 100 TB
    this is a single scan + partial aggs; the output row is the gate a
    pipeline asserts on before shipping a corpus snapshot."""
    docs = read_table(spark, sf_dir, "documents")
    empty = F.col("text").isNull() | (F.length(F.trim("text")) == 0)
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("doc_id").isNull().cast("long")).cast("bigint").alias("null_doc_id"),
        F.sum(empty.cast("long")).cast("bigint").alias("empty_text"),
        F.countDistinct("doc_id").alias("distinct_doc_id"),
        (F.countDistinct("doc_id") == F.count("*")).alias("doc_id_unique"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.sum((F.col("n_chars") != F.length("text")).cast("long"))
        .cast("bigint")
        .alias("n_chars_mismatch"),
        F.sum(
            (~F.col("lang").isin("en", "de", "fr", "es", "zz")).cast("long")
        )
        .cast("bigint")
        .alias("lang_out_of_domain"),
    )
