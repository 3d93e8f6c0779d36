"""Lineage pinning with a configurable durability tier.

``pin(df)`` is THE way this engine truncates lineage / freezes a
frame consumed more than once (fixpoint rounds, multi-consumer
expensive streams, nondeterministic-stage pins — see SCALE.md
"Lineage pins"). Every former ``df.localCheckpoint()`` call site
routes through here so ONE config knob selects the durability tier:

- ``spark.wiki_data_pipeline.pin.mode = local`` (default):
  ``DataFrame.localCheckpoint`` — blocks stored on executors only.
  Cheapest (no DFS write), right for fixture scale and for clusters
  with stable executors. Trade-off: an executor loss makes the
  pinned blocks unrecoverable BECAUSE the lineage was truncated —
  the job fails instead of recomputing.
- ``spark.wiki_data_pipeline.pin.mode = reliable``:
  ``DataFrame.checkpoint`` — blocks written to the SparkContext
  checkpoint directory (HDFS/object store on a real cluster). The
  right tier on preemptible/spot 100 TB clusters: a lost executor
  re-reads the checkpoint instead of failing the job. Costs a DFS
  write + read per pin. The checkpoint dir comes from
  ``SparkContext.setCheckpointDir`` or, if unset, from
  ``spark.wiki_data_pipeline.pin.checkpointDir`` (set lazily at the
  first reliable pin).

Both tiers return a frame whose plan is a scan of materialized
blocks, so every downstream consumer reuses ONE materialization —
the single-consumption discipline — and nondeterministic upstream
stages (reservoir seeds, range-exchange sampling) are evaluated
exactly once (the ``with_global_offsets`` soundness requirement,
operators/packing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PIN_MODE_KEY = "spark.wiki_data_pipeline.pin.mode"
PIN_DIR_KEY = "spark.wiki_data_pipeline.pin.checkpointDir"


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its lineage; tier per config.

    ``eager=False`` defers materialization to the first action (used
    where the caller immediately drives the frame anyway and wants to
    avoid a separate job)."""
    spark = df.sparkSession
    mode = spark.conf.get(PIN_MODE_KEY, "local")
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            cp_dir = spark.conf.get(PIN_DIR_KEY, None)
            if cp_dir is None:
                raise ValueError(
                    f"{PIN_MODE_KEY}=reliable needs a checkpoint "
                    "directory: call SparkContext.setCheckpointDir or "
                    f"set {PIN_DIR_KEY}"
                )
            sc.setCheckpointDir(cp_dir)
        return df.checkpoint(eager=eager)
    raise ValueError(
        f"unknown {PIN_MODE_KEY} {mode!r} (expected 'local' or 'reliable')"
    )
