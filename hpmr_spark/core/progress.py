"""Verbose progress reporting — the reference's root-rank exponential
milestones (src/range.h:39-57, src/dist_map.h:151-152), re-expressed for
Spark's execution model (SURVEY §4 row 12).

The reference prints "0.1% 0.2% 0.4% ... " from the rank-0 thread-0 loop
body, doubling the target after each milestone crossed. Spark jobs don't
expose a per-row loop, but the driver's StatusTracker exposes completed vs
total tasks per stage — the same progress fraction at task granularity. A
daemon poller thread reads it and emits the identical doubling milestone
sequence; the milestone arithmetic itself is a pure function so its
semantics are unit-testable without a cluster.

Scale note: polling is driver-only metadata (py4j StatusTracker calls at
~5 Hz) — zero executor-side cost, safe on a 1000-executor job.
"""

from __future__ import annotations

import threading
from typing import Callable, List, Tuple

INITIAL_TARGET = 0.1  # src/range.h:39 — first milestone at 0.1%


def milestones_crossed(
    current_progress_pct: float, target_pct: float
) -> Tuple[List[float], float]:
    """Pure replica of the reference's milestone loop (src/range.h:52-56):
    emit every target <= current progress, doubling each time. Returns
    (milestones to print, new target)."""
    out: List[float] = []
    while target_pct <= current_progress_pct:
        out.append(target_pct)
        target_pct *= 2
    return out, target_pct


class ProgressReporter:
    """Attachable progress hook for one Spark job group.

    Usage::

        with ProgressReporter(spark, emit=print):
            df.collect()

    Emits "x.y% " milestone strings exactly like the reference's verbose
    mapreduce, derived from completed/total active-stage tasks."""

    def __init__(
        self,
        spark,
        emit: Callable[[str], None] | None = None,
        poll_interval_s: float = 0.2,
    ):
        self._sc = spark.sparkContext
        self._emit = emit if emit is not None else lambda s: print(s, end="")
        self._poll = poll_interval_s
        self._target = INITIAL_TARGET
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.emitted: List[float] = []  # milestone log (test surface)

    def _progress_pct(self) -> float:
        tracker = self._sc.statusTracker()
        total = 0
        done = 0
        for sid in tracker.getActiveStageIds():
            info = tracker.getStageInfo(sid)
            if info is None:
                continue
            total += info.numTasks
            done += info.numCompletedTasks
        if total == 0:
            return 0.0
        return done * 100.0 / total

    def _run(self) -> None:
        while not self._stop.wait(self._poll):
            crossed, self._target = milestones_crossed(
                self._progress_pct(), self._target
            )
            for m in crossed:
                self.emitted.append(m)
                self._emit(f"{m:.1f}% ")

    def __enter__(self) -> "ProgressReporter":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        # terminal newline like the reference's closing printf("\n")
        self._emit("\n")
