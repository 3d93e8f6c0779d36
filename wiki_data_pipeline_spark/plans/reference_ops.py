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
      CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_words,
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
      CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS word_count,
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
      regexp_replace(trim(text), '\\s+', ' ', 'g') AS cleaned,
      CAST(length(text) - length(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS BIGINT)
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
      list_filter(
        list_transform(
          ['Category:' || lang, 'Category:  ' || source, '  ', 'Plain'],
          x -> trim(regexp_replace(x, '^Category:', ''))),
        x -> x <> '')                       AS categories,
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
    (documents have no category column; FIXTURES.md §B mapping)."""
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
        cats.alias("categories"),
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
        F.to_json(F.struct("doc_id", "lang", "source", "n_chars")).alias("record_json"),
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
      CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS word_count,
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
      CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_words,
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
