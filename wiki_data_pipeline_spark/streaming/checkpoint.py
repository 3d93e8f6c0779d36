"""Batch high-watermark checkpointing (reference ST2:
src/checkpoint_manager.py — resumable progress persisted as JSON).

The reference tracks ``last_processed_index`` and skips re-enumeration
on resume (can_resume :96-98, get_resume_info :100-108). The batch
engine analog: persist the max committed sequence value; the next run
filters ``seq > watermark`` — a pushed-down range predicate, so resume
cost scales with NEW data only. Structured Streaming's
checkpointLocation (streaming/jobs.py) is the streaming counterpart —
we do not hand-roll offset logs for streams."""

from __future__ import annotations

import contextlib
import json
import os
import tempfile
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CheckpointLeaseError(RuntimeError):
    """Another live run holds this checkpoint's lease.

    The reference's queue/checkpoint assumes exactly one process
    (src/queue_manager.py:34-50, src/checkpoint_manager.py:39-47 —
    read-modify-write JSON with no guard); two concurrent runs there
    silently double-process the pending queue or interleave watermark
    commits. The Spark engine makes the single-writer assumption
    EXPLICIT: a second concurrent runner fails fast with this error
    instead of corrupting the watermark or duplicating sink files."""


@dataclass
class CheckpointState:
    """Reference checkpoint record shape (src/checkpoint_manager.py:9-17),
    minus wall-clock fields that would break determinism in tests."""

    watermark: int = -1
    total_processed: int = 0
    runs: int = 0
    status: str = "idle"


class HighWatermarkCheckpoint:
    def __init__(self, path: str) -> None:
        self.path = path

    # ---------------------------------------------------------------
    # Single-writer lease. POSIX O_CREAT|O_EXCL is the atomic
    # primitive (works on any local/NFS-v3+ filesystem, no fcntl
    # byte-range locks that silently no-op on some network mounts);
    # the holder's pid rides in the file so a crashed run's stale
    # lock is reaped instead of wedging the checkpoint forever.
    # ---------------------------------------------------------------

    @property
    def lock_path(self) -> str:
        return self.path + ".lock"

    def _try_acquire(self) -> bool:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        try:
            fd = os.open(
                self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError:
            return False
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(str(os.getpid()))
        return True

    def acquire(self) -> None:
        """Take the single-writer lease or raise CheckpointLeaseError.

        A lock held by a DEAD pid (runner crashed between acquire and
        release) is reaped and re-contended once — liveness beats a
        manual `rm`; a lock held by a LIVE pid (including this one:
        two threads of one driver race the same out_dir) is an error,
        never a wait — a batch runner queueing behind another run on
        the same checkpoint is operator error, and failing fast
        surfaces it."""
        if self._try_acquire():
            return
        try:
            with open(self.lock_path, encoding="utf-8") as f:
                pid = int(f.read().strip() or "-1")
        except (OSError, ValueError):
            pid = -1
        alive = False
        if pid > 0:
            try:
                os.kill(pid, 0)
                alive = True
            except ProcessLookupError:
                alive = False
            except PermissionError:
                alive = True  # exists, owned by someone else
        if not alive and self._reap_stale(pid) and self._try_acquire():
            return
        raise CheckpointLeaseError(
            f"checkpoint {self.path} is leased by a live run (lock "
            f"{self.lock_path}, holder pid {pid}); concurrent runners "
            "on one checkpoint would double-process the same delta"
        )

    def _reap_stale(self, dead_pid: int) -> bool:
        """Remove a lock whose holder pid is dead. Claimed by RENAME,
        not unlink: two contenders that both observed the dead pid
        would otherwise both unlink-and-acquire — the second unlink
        removing the first's fresh LIVE lock, yielding two concurrent
        'single-writer' holders (TOCTOU). rename() is atomic, so
        exactly one contender wins the reap; the loser sees
        FileNotFoundError and treats it as contention.

        After the rename we re-verify the claimed file still names the
        dead pid: if another contender already reaped and a NEW holder
        acquired in between, we just stole a live lock — restore it
        with link() (atomic, refuses to clobber a newer lock) and
        report contention."""
        claim = f"{self.lock_path}.reap.{os.getpid()}"
        try:
            os.rename(self.lock_path, claim)
        except FileNotFoundError:
            return False  # another contender reaped first
        try:
            with open(claim, encoding="utf-8") as f:
                claimed_pid = int(f.read().strip() or "-1")
        except (OSError, ValueError):
            claimed_pid = -1
        if claimed_pid == dead_pid:
            os.unlink(claim)
            return True
        # Stole a re-created (live) lock: put it back without
        # clobbering anything newer, then yield.
        try:
            os.link(claim, self.lock_path)
        except FileExistsError:
            pass  # a newer lock appeared; leave it be
        os.unlink(claim)
        return False

    def release(self) -> None:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(self.lock_path)

    @contextlib.contextmanager
    def lease(self):
        self.acquire()
        try:
            yield self
        finally:
            self.release()

    def load(self) -> CheckpointState:
        if not os.path.exists(self.path):
            return CheckpointState()
        with open(self.path, encoding="utf-8") as f:
            return CheckpointState(**json.load(f))

    def save(self, state: CheckpointState) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(asdict(state), f)
        os.replace(tmp, self.path)  # atomic commit

    def incremental(self, df: DataFrame, seq_col: str) -> DataFrame:
        """Rows newer than the committed watermark (pushdown-friendly)."""
        return df.filter(F.col(seq_col) > self.load().watermark)

    def commit(
        self, df: DataFrame, seq_col: str, n_processed: int | None = None
    ) -> CheckpointState:
        """Advance the watermark to max(seq) of the processed batch.
        Call AFTER the sink write succeeds (at-least-once + idempotent
        sink ≡ the reference's overwrite=True story, ST3).

        ``df`` must be EVERYTHING the run disposed of — successes AND
        dead-lettered rows (the reference's mark_failed also advances
        past failures, src/checkpoint_manager.py); otherwise a failed
        row above the max success id would be re-selected and
        re-dead-lettered on every subsequent run. ``n_processed``
        overrides the amount added to ``total_processed`` (e.g. count
        only sink-written rows while the watermark still covers the
        dead-lettered ones — total_processed seeds the consecutive
        output-file numbering, L3)."""
        agg = df.agg(
            F.max(seq_col).alias("mx"), F.count("*").alias("n")
        ).collect()[0]
        return self.commit_values(
            watermark=agg["mx"],
            n_disposed=int(agg["n"]),
            n_processed=n_processed,
        )

    def commit_values(
        self,
        watermark: int | None,
        n_disposed: int,
        n_processed: int | None = None,
    ) -> CheckpointState:
        """Commit from PRECOMPUTED aggregates — for callers whose sink
        jobs already saw every row (Observation on a DataFrame write,
        or the JSON sink's per-partition max): no extra scan of the
        source. ``watermark`` is max(seq) over everything disposed
        (None when the batch was empty); ``n_disposed`` gates the
        advance; ``n_processed`` overrides the total_processed
        increment as in :meth:`commit`."""
        state = self.load()
        if n_disposed and watermark is not None:
            state.watermark = int(watermark)
            state.total_processed += int(
                n_disposed if n_processed is None else n_processed
            )
        state.runs += 1
        state.status = "processing"
        self.save(state)
        return state
