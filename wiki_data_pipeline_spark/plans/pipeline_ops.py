"""Training-data pipeline extensions, wave 2 (round 5): two-stage ANN
serving (PQ rerank), paragraph-granularity dedup, Bloom-filter ingest
probing, dup-graph topology (triangles / degree histogram), and
Matryoshka embedding-truncation auditing.

Same determinism discipline as ``llm_ops``: md5 for every hash
(identical hex both engines), hex→int via Spark ``conv`` ≡ DuckDB
``'0x…'::BIGINT``, ratios as exact half-up integer division
(``(2a+b) div (2b)`` in pure BIGINT), and float ratios quantized
through the same double on both engines (``round(x*1e6)/1e6``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wiki_data_pipeline_spark.functions.vectors import as_double, cosine, dot
from wiki_data_pipeline_spark.io import read_table
from wiki_data_pipeline_spark.plans.llm_ops import (
    _CORPUS_SQL,
    _MINHASH_CTES,
    _N_QUERIES,
    _PQ_ADC_CTES,
    _TOPK,
    _cos_sql,
    _dedup_corpus,
    _spread,
    dedup_minhash_lsh,
    pq_adc_distances,
)
from wiki_data_pipeline_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Two-stage ANN serving: PQ-ADC candidate generation → exact rerank.
# ---------------------------------------------------------------------------

_RERANK_POOL = 4 * _TOPK  # ADC candidates per query fed to the reranker


@query(
    "sim_ann_pq_rerank",
    oracle=f"""
    WITH {_PQ_ADC_CTES},
    pool AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY adc_dist, vec_id) AS crank
        FROM adc
      ) WHERE crank <= {_RERANK_POOL}
    ),
    scored AS (
      SELECT p.query_id, p.vec_id, {_cos_sql('q.ve', 'v.ve')} AS score
      FROM pool p
      JOIN emb q ON q.vec_id = p.query_id
      JOIN emb v ON v.vec_id = p.vec_id
    )
    SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, vec_id, score,
        row_number() OVER (PARTITION BY query_id
          ORDER BY score DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= {_TOPK}
    """,
)
def sim_ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN serving: PQ asymmetric-distance scan proposes a
    4k-candidate pool per query (compressed codes only — the cheap,
    lossy stage), then ONLY those candidates' raw vectors are fetched
    and reranked by exact cosine (Jégou et al. 2011 §V's
    re-ranking; the shape every production vector store uses). Extends
    SURVEY.md §2's similarity family with the recall-restoring layer
    above ``sim_ann_pq_adc``.

    Scale: the ADC stage never touches raw floats; the rerank joins
    raw vectors for |Q|·pool rows only — point lookups against the
    vec_id-keyed store, not a scan. Pool size is THE recall/latency
    knob; 4×k restores most of the ADC quantization loss. Scores are
    rounded to 6 decimals before ranking with vec_id tie-breaks (the
    sim_cosine_topk discipline)."""
    adc = pq_adc_distances(spark, sf_dir)
    w_pool = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist"), F.col("vec_id")
    )
    pool = (
        adc.withColumn("crank", F.row_number().over(w_pool))
        .filter(F.col("crank") <= _RERANK_POOL)
        .select("query_id", "vec_id")
    )
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("ve")
    )
    q = emb.select(F.col("vec_id").alias("query_id"), F.col("ve").alias("qe"))
    scored = (
        pool.join(q, on="query_id")
        .join(emb, on="vec_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("qe"), F.col("ve")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _TOPK)
    )


# ---------------------------------------------------------------------------
# Paragraph-granularity dedup (CCNet-style) over fixed token chunks.
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 16


@query(
    "dedup_paragraph_chunks",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM corpus
    ),
    ch AS (
      SELECT DISTINCT doc_id,
        unnest(list_transform(
          generate_series(0, (len(toks) - 1) // {_CHUNK_TOKENS}),
          i -> md5(array_to_string(
            toks[i*{_CHUNK_TOKENS}+1 : i*{_CHUNK_TOKENS}+{_CHUNK_TOKENS}], ' '))
        )) AS chunk_hash
      FROM tok
    ),
    shared AS (
      SELECT chunk_hash FROM ch GROUP BY chunk_hash HAVING count(*) > 1
    )
    SELECT ch.doc_id,
      count(*) AS n_chunks,
      CAST(sum(CASE WHEN s.chunk_hash IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_dup_chunks,
      CAST((2 * 1000000 * sum(CASE WHEN s.chunk_hash IS NOT NULL
                              THEN 1 ELSE 0 END) + count(*))
           // (2 * count(*)) AS BIGINT) AS dup_frac_micro
    FROM ch LEFT JOIN shared s USING (chunk_hash)
    GROUP BY ch.doc_id
    """,
)
def dedup_paragraph_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity dedup (CCNet, Wenzek et al. 2020: dedup at
    paragraph level, not document level — catches boilerplate and
    partial copies that document hashing misses). The corpus has no
    newline structure, so "paragraphs" are fixed 16-token chunks (the
    ``text_chunking`` boundary rule); each doc's distinct chunk hashes
    are matched against the corpus-wide set of chunks seen in >1 doc,
    yielding per-doc duplicated-paragraph fractions — the column a
    cleaning pipeline thresholds on (drop doc, or strip the chunks).

    Scale: one narrow chunk+md5 pass, one shuffle on chunk_hash for
    the shared-set aggregate, one shuffle back on chunk_hash to flag —
    never doc×doc. The shared set is corpus-sized/dup-rate-sized; the
    flag join is a plain hash join that AQE will broadcast when small.
    dup_frac is exact half-up integer division in micro units (the
    cross-engine ratio discipline)."""
    corpus = _dedup_corpus(spark, sf_dir)
    toks = F.col("toks")
    chunk_hashes = F.transform(
        F.sequence(F.lit(0), F.expr(f"(size(toks) - 1) div {_CHUNK_TOKENS}")),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(toks, i * _CHUNK_TOKENS + 1, _CHUNK_TOKENS))
        ),
    )
    ch = (
        _spread(corpus)
        .select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
        .select("doc_id", F.explode(F.array_distinct(chunk_hashes)).alias("chunk_hash"))
    )
    shared = (
        ch.groupBy("chunk_hash")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("chunk_hash", F.lit(1).alias("dup"))
    )
    return (
        ch.join(shared, on="chunk_hash", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.coalesce(F.col("dup"), F.lit(0))).cast("bigint").alias(
                "n_dup_chunks"
            ),
        )
        .withColumn(
            "dup_frac_micro",
            F.expr(
                "(2 * 1000000 * n_dup_chunks + n_chunks) div (2 * n_chunks)"
            ).cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter dedup probe: membership against a historical corpus.
# ---------------------------------------------------------------------------

_BLOOM_BITS = 4096
_BLOOM_K = 3


def _bloom_bits_sql(texpr: str) -> str:
    """k=3 bit positions from disjoint 8-hex slices of one md5 — the
    Kirsch-Mitzenmacher trick (k hashes from one computation)."""
    return (
        "["
        + ", ".join(
            f"('0x' || substr(md5({texpr}), {1 + 8 * j}, 8))::BIGINT"
            f" % {_BLOOM_BITS}"
            for j in range(_BLOOM_K)
        )
        + "]"
    )


@query(
    "bloom_filter_probe",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    hashed AS (
      SELECT doc_id, md5(text) AS digest,
        {_bloom_bits_sql('text')} AS bits
      FROM corpus
    ),
    seen_bits AS (
      SELECT DISTINCT unnest(bits) AS bit FROM hashed WHERE doc_id < 100000
    ),
    seen_digests AS (
      SELECT DISTINCT digest FROM hashed WHERE doc_id < 100000
    ),
    probe AS (
      SELECT doc_id, digest, unnest(list_distinct(bits)) AS bit
      FROM hashed WHERE doc_id >= 100000
    ),
    per_doc AS (
      SELECT p.doc_id, p.digest,
        CAST(min(CASE WHEN sb.bit IS NULL THEN 0 ELSE 1 END) AS BIGINT)
          AS bloom_hit,
        CAST(max(CASE WHEN sd.digest IS NULL THEN 0 ELSE 1 END) AS BIGINT)
          AS true_dup
      FROM probe p
      LEFT JOIN seen_bits sb USING (bit)
      LEFT JOIN seen_digests sd ON sd.digest = p.digest
      GROUP BY p.doc_id, p.digest
    )
    SELECT
      count(*) AS n_probe,
      CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_hits,
      CAST(sum(true_dup) AS BIGINT) AS n_true_dups,
      CAST(sum(CASE WHEN bloom_hit = 1 AND true_dup = 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_false_pos,
      CAST(sum(CASE WHEN bloom_hit = 0 AND true_dup = 1 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_missed_true,
      CAST((2 * 1000000 * sum(CASE WHEN bloom_hit = 1 AND true_dup = 0
                              THEN 1 ELSE 0 END)
            + (count(*) - sum(true_dup)))
           // (2 * (count(*) - sum(true_dup))) AS BIGINT) AS fp_rate_micro
    FROM per_doc
    """,
)
def bloom_filter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter dedup-on-ingest probe (Bloom 1970; the standard
    way a new batch checks membership against a petabyte-scale
    historical corpus WITHOUT joining it): the "seen" corpus's content
    digests set k=3 bits each in an m=4096-bit filter (bit positions =
    three disjoint 8-hex slices of one md5 — Kirsch-Mitzenmacher's k-
    hashes-from-one trick, same double-hashing family the MinHash
    stage uses); the probe batch (doc_id ≥ 100000: 50 exact clones +
    50 near-dups of the base corpus) checks all its bits. The summary
    row measures what a capacity planner needs: hit counts, true-dup
    counts, false positives, the fp rate among true negatives — and
    ``n_missed_true``, pinned to 0 by the filter's no-false-negative
    guarantee (a nonzero value would mean the bit derivation drifted
    between build and probe).

    Scale: the filter is m bits regardless of corpus size → the
    seen-bits set is broadcast; the historical corpus is read ONCE to
    build bits, never joined row-wise. At real scale m sizes to
    n·k/ln2 bits and the same plan holds; Bloom hits then fall through
    to ``dedup_exact``'s digest join for confirmation (two-stage, like
    the LSH→verify dedup path)."""
    corpus = _dedup_corpus(spark, sf_dir)
    digest = F.md5("text")
    bits = F.array(
        *[
            (
                F.conv(F.substring(digest, 1 + 8 * j, 8), 16, 10).cast("long")
                % _BLOOM_BITS
            )
            for j in range(_BLOOM_K)
        ]
    )
    hashed = _spread(corpus).select(
        "doc_id", digest.alias("digest"), bits.alias("bits")
    )
    seen = hashed.filter(F.col("doc_id") < 100000)
    seen_bits = seen.select(F.explode("bits").alias("bit")).distinct()
    seen_digests = seen.select("digest").distinct()
    probe = hashed.filter(F.col("doc_id") >= 100000).select(
        "doc_id", "digest", F.explode(F.array_distinct("bits")).alias("bit")
    )
    per_doc = (
        probe.join(
            F.broadcast(seen_bits.select("bit", F.lit(1).alias("present"))),
            on="bit",
            how="left",
        )
        .join(
            F.broadcast(seen_digests.select("digest", F.lit(1).alias("known"))),
            on="digest",
            how="left",
        )
        .groupBy("doc_id", "digest")
        .agg(
            F.min(F.coalesce(F.col("present"), F.lit(0))).cast("bigint").alias(
                "bloom_hit"
            ),
            F.max(F.coalesce(F.col("known"), F.lit(0))).cast("bigint").alias(
                "true_dup"
            ),
        )
    )
    fp = F.sum(((F.col("bloom_hit") == 1) & (F.col("true_dup") == 0)).cast("long"))
    return (
        per_doc.agg(
            F.count("*").alias("n_probe"),
            F.sum("bloom_hit").cast("bigint").alias("n_bloom_hits"),
            F.sum("true_dup").cast("bigint").alias("n_true_dups"),
            fp.cast("bigint").alias("n_false_pos"),
            F.sum(
                ((F.col("bloom_hit") == 0) & (F.col("true_dup") == 1)).cast("long")
            )
            .cast("bigint")
            .alias("n_missed_true"),
        )
        .withColumn(
            "fp_rate_micro",
            F.expr(
                "(2 * 1000000 * n_false_pos + (n_probe - n_true_dups))"
                " div (2 * (n_probe - n_true_dups))"
            ).cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# Dup-graph topology: triangles / clustering and the degree histogram.
# ---------------------------------------------------------------------------

_GRAPH_CTES = f"""{_MINHASH_CTES},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.sig = b.sig
        AND a.doc_id < b.doc_id
    ),
    deg AS (
      SELECT node, count(*) AS degree FROM (
        SELECT doc_a AS node FROM pairs
        UNION ALL
        SELECT doc_b AS node FROM pairs
      ) GROUP BY node
    )"""


@query(
    "graph_triangle_stats",
    oracle=f"""
    WITH {_GRAPH_CTES},
    tri AS (
      SELECT count(*) AS n_triangles
      FROM pairs e1
      JOIN pairs e2 ON e2.doc_a = e1.doc_b
      JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    )
    SELECT
      (SELECT count(*) FROM deg) AS n_nodes,
      (SELECT count(*) FROM pairs) AS n_edges,
      (SELECT CAST(sum(degree * (degree - 1)) // 2 AS BIGINT) FROM deg)
        AS n_wedges,
      CAST(n_triangles AS BIGINT) AS n_triangles,
      CAST(CASE WHEN (SELECT sum(degree * (degree - 1)) FROM deg) = 0 THEN 0
        ELSE (2 * 1000000 * 3 * n_triangles
              + (SELECT sum(degree * (degree - 1)) // 2 FROM deg))
             // (2 * (SELECT sum(degree * (degree - 1)) // 2 FROM deg))
        END AS BIGINT) AS closed_frac_micro
    FROM tri
    """,
)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the MinHash
    near-dup pair graph — the topology audit that tells a dedup
    pipeline whether its candidate graph is clique-like (true dup
    clusters close their triangles → safe to keep one doc per
    component) or chain-like (transitive merging over low-closure
    chains collapses NON-duplicates together — the classic LSH
    over-merge failure). Triangles via the oriented three-way self-
    join on a<b<c edges (each triangle counted once); wedges =
    Σ deg·(deg−1)/2; closed fraction = 3·triangles/wedges in exact
    half-up micro units.

    Scale: the standard distributed triangle counting shape (Suri &
    Vassilvitskii 2011) — orienting edges by id (degree ordering at
    real scale) bounds each join's fan-out; every join shuffles on an
    edge endpoint, never materializing node neighborhoods on one
    machine. The dup graph is sparse (bounded bucket sizes upstream),
    so the 3-way join is linear-ish in edges."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    deg = (
        pairs.select(F.col("doc_a").alias("node"))
        .unionAll(pairs.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    node_stats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.expr("sum(degree * (degree - 1)) div 2").cast("bigint").alias("n_wedges"),
    )
    edge_stats = pairs.agg(F.count("*").alias("n_edges"))
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.doc_a") == F.col("e1.doc_b"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    return (
        node_stats.crossJoin(edge_stats)
        .crossJoin(tri)
        .withColumn(
            "closed_frac_micro",
            F.expr(
                "CASE WHEN n_wedges = 0 THEN CAST(0 AS BIGINT)"
                " ELSE (2 * 1000000 * 3 * n_triangles + n_wedges)"
                " div (2 * n_wedges) END"
            ).cast("bigint"),
        )
        .select(
            "n_nodes", "n_edges", "n_wedges", "n_triangles", "closed_frac_micro"
        )
    )


@query(
    "graph_degree_histogram",
    oracle=f"""
    WITH {_GRAPH_CTES}
    SELECT degree, count(*) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup pair graph — the skew
    instrument for dedup at scale: a heavy-tailed histogram means hub
    documents (boilerplate, templates) whose components will snowball
    under transitive merging, and whose LSH buckets need the
    ``max_bucket_size`` cap. Two hash aggregations (node → degree,
    degree → count); at 100 TB both shuffle tiny aggregate rows, and
    the histogram (≤ max-degree rows) is the thing you alert on."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return (
        pairs.select(F.col("doc_a").alias("node"))
        .unionAll(pairs.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
        .groupBy("degree")
        .agg(F.count("*").alias("n_nodes"))
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation audit: energy retained by embedding prefixes.
# ---------------------------------------------------------------------------

_MRL_DIM = 16  # truncation prefix length audited (of 64 stored dims)


@query(
    "emb_matryoshka_energy",
    oracle=f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings)
    SELECT vec_id,
      round(list_dot_product(ve[1:{_MRL_DIM}], ve[1:{_MRL_DIM}])
            / list_dot_product(ve, ve) * 1000000) / 1000000.0
        AS head_energy_frac
    FROM emb
    """,
)
def emb_matryoshka_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (Kusupati et al. 2022: MRL-trained
    embeddings pack most signal into a prefix, so serving can truncate
    64→16 dims and renormalize for 4× cheaper ANN): per-vector
    fraction of squared-norm energy retained by the first 16 dims —
    the measurement that decides whether a corpus's embeddings are
    truncation-safe (MRL-trained ⇒ frac ≫ dim-fraction; isotropic ⇒
    frac ≈ 16/64, truncation loses proportionally).

    Map-only, shuffle-free: two zip_with/aggregate folds per row, all
    JVM-side. The ratio is quantized through the same double on both
    engines (round(x·1e6)/1e6 — the cross-engine float discipline);
    the numerator/denominator folds are left-to-right over identical
    doubles, so the input to the rounding is bit-identical."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("ve")
    )
    head = F.slice("ve", 1, _MRL_DIM)
    frac = dot(head, head) / dot(F.col("ve"), F.col("ve"))
    return emb.select(
        "vec_id",
        (F.round(frac * 1000000, 0) / 1000000.0).alias("head_energy_frac"),
    )
