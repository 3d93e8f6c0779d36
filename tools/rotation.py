"""Coverage-rotation policy for the evaluation harness.

The external correctness harness writes ``CORRECTNESS_r{N}.json`` at the
repo root and samples a prefix of the exported registry each round, so
export order doubles as a coverage-rotation policy. This module derives
a stalest-first ordering from those artifacts; it is harness-layer code
(applied only by ``__spark_entry__.py`` and ``tools/check_parity.py``),
so library export order (``plans.registry.all_queries``) stays plain
registration order regardless of what artifacts sit in the deployment
directory.
"""

from __future__ import annotations

import json
import os
import re


def correctness_history(
    repo_root: str, oracles: dict[str, str]
) -> dict[str, tuple[int, bool]]:
    """name → (last round the harness sampled it, did that row pass).

    A row counts as ok if all three checks passed, or if it is a
    rows-only row that produced rows (``err == "no_oracle"``) for a
    query that STILL has no oracle — rows-only status is reported
    honestly, not hidden from the sampling window, and a query that has
    since gained an oracle counts as unconfirmed until a value-checked
    row exists."""
    history: dict[str, tuple[int, bool]] = {}
    try:
        entries = sorted(os.listdir(repo_root))
    except OSError:
        return history
    for fname in entries:
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(os.path.join(repo_root, fname)) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and name not in oracles
            )
            prev = history.get(name)
            if prev is None or rnd >= prev[0]:
                history[name] = (rnd, ok)
    return history


def rotate(
    names: list[str], oracles: dict[str, str], repo_root: str
) -> list[str]:
    """Stalest-first sampling order: names whose latest sampled row
    failed come first, then never-sampled names, then passing names
    with the oldest green row first — so a fixed-size sampling prefix
    re-confirms stale results before re-checking fresh ones.
    Registration order breaks all ties, keeping the order stable; with
    no artifacts present the input order is returned unchanged."""
    history = correctness_history(repo_root, oracles)
    if not history:
        return list(names)
    reg_idx = {n: i for i, n in enumerate(names)}

    def key(name: str) -> tuple[int, int, int]:
        row = history.get(name)
        if row is None:
            return (1, 0, reg_idx[name])
        rnd, ok = row
        return (2, rnd, reg_idx[name]) if ok else (0, rnd, reg_idx[name])

    return sorted(names, key=key)
