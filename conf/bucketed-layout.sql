-- Bucketed fact-table layout DDL for the 100 TB deployment (r13,
-- SCALE.md "Cluster profile" section; the fixture-scale twin of this
-- layout is materialized programmatically by
-- plans/star_schema.py:_ensure_bucketed_orderkey_layout and its
-- no-Exchange plan property is asserted in tests/test_bucketing.py).
--
-- Why: lineitem JOIN orders ON orderkey is the engine's one
-- unavoidable fact-to-fact join. Bucketing BOTH tables by the join
-- key into the SAME bucket count makes the storage layout the join
-- partitioning — the recurring shuffle of both facts becomes a
-- map-side sorted merge, paid once at write time instead of on every
-- query. 1024 buckets targets ~100 GB of lineitem per bucket-pair
-- merge at 100 TB scale with 128-512 MB files inside each bucket;
-- scale the count with the corpus (power of two keeps resplits
-- cheap), but the two tables MUST agree.
--
-- Run with spark-sql against the production catalog; replace
-- LOCATION with the warehouse path. INSERT ... SELECT from the raw
-- parquet ingests into the layout.

CREATE TABLE IF NOT EXISTS lineitem_bucketed (
  l_orderkey      BIGINT,
  l_partkey       BIGINT,
  l_suppkey       BIGINT,
  l_linenumber    INT,
  l_quantity      DOUBLE,
  l_extendedprice DOUBLE,
  l_discount      DOUBLE,
  l_tax           DOUBLE,
  l_returnflag    STRING,
  l_linestatus    STRING,
  l_shipdate      TIMESTAMP
)
USING PARQUET
CLUSTERED BY (l_orderkey) SORTED BY (l_orderkey) INTO 1024 BUCKETS;

CREATE TABLE IF NOT EXISTS orders_bucketed (
  o_orderkey      BIGINT,
  o_custkey       BIGINT,
  o_orderstatus   STRING,
  o_totalprice    DOUBLE,
  o_orderdate     TIMESTAMP,
  o_orderpriority STRING
)
USING PARQUET
CLUSTERED BY (o_orderkey) SORTED BY (o_orderkey) INTO 1024 BUCKETS;

-- Ingest (repartition by the bucket key first so each task writes
-- few buckets; without it every task opens 1024 files):
--   INSERT OVERWRITE TABLE lineitem_bucketed
--   SELECT /*+ REPARTITION(1024, l_orderkey) */ * FROM lineitem_raw;
--   INSERT OVERWRITE TABLE orders_bucketed
--   SELECT /*+ REPARTITION(1024, o_orderkey) */ * FROM orders_raw;

-- The documents/embeddings tables deliberately stay UNbucketed: the
-- dedup/similarity families join through derived keys (minhash
-- bands, LSH buckets, IVF cells) that are computed per query — a
-- static bucket key buys nothing there; date/source partitioning +
-- 128-512 MB files is their layout story (SCALE.md "Scan sizing").
