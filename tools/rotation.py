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


def plan_change_rounds(repo_root: str, names: list[str]) -> dict[str, int]:
    """name → round the query's source fingerprint last changed, from
    the committed ``PLAN_FINGERPRINTS.json`` snapshot (maintained by
    ``tools/plan_fingerprints.py``). A query whose CURRENT source no
    longer matches the snapshot (edited after the last regen) maps to
    a round newer than any driver artifact, so it fronts immediately.
    Missing snapshot / unimportable registry → empty (pure
    stalest-first ordering, the pre-r15 behavior — and what the
    synthetic-name simulation tests exercise)."""
    import sys

    path = os.path.join(repo_root, "PLAN_FINGERPRINTS.json")
    try:
        with open(path, encoding="utf-8") as fh:
            snap = json.load(fh)["queries"]
    except (OSError, ValueError, KeyError):
        return {}
    try:
        for p in (repo_root, os.path.join(repo_root, "tools")):
            if p not in sys.path:
                sys.path.insert(0, p)
        from plan_fingerprints import current_fingerprints

        current = current_fingerprints()
    except Exception:  # registry unimportable here: snapshot-only view
        current = {}
    out: dict[str, int] = {}
    for n in names:
        entry = snap.get(n)
        if not isinstance(entry, dict):
            continue
        if n in current and current[n] != entry.get("src_md5"):
            out[n] = 1 << 30  # post-snapshot edit: newer than any round
        else:
            out[n] = int(entry.get("round", 0))
    return out


def rotate(
    names: list[str], oracles: dict[str, str], repo_root: str
) -> list[str]:
    """Sampling order for the driver's fixed-size prefix:

    1. ROUND-TOUCHED queries — a green row exists but the query's
       source fingerprint changed AFTER it was sampled (r15, verdict
       item 2: a rewrite must not hide behind its pre-rewrite green
       row for ~N/S rounds);
    2. names whose latest sampled row FAILED;
    3. never-sampled names;
    4. passing names, oldest green row first (stalest-first).

    Registration order breaks all ties, keeping the order stable; with
    no artifacts present the input order is returned unchanged."""
    history = correctness_history(repo_root, oracles)
    if not history:
        return list(names)
    changed = plan_change_rounds(repo_root, names)
    reg_idx = {n: i for i, n in enumerate(names)}

    def key(name: str) -> tuple[int, int, int]:
        row = history.get(name)
        if row is None:
            return (2, 0, reg_idx[name])
        rnd, ok = row
        if ok and changed.get(name, 0) > rnd:
            return (0, rnd, reg_idx[name])
        return (3, rnd, reg_idx[name]) if ok else (1, rnd, reg_idx[name])

    return sorted(names, key=key)
