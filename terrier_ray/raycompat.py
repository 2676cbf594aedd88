"""Workarounds for Ray-runtime sharp edges (this Ray version, this sandbox).

The library itself never calls ray.init/ray.shutdown (driver contract);
these helpers are for the processes that DO own a Ray session (bench.py,
tools/, the pytest fixture).
"""

from __future__ import annotations


def quiesce_ray_data_stats() -> None:
    """Call right before ``ray.shutdown()``.

    Ray Data's _StatsManager keeps a daemon thread that pushes metrics to
    the _StatsActor every 5 s for as long as any dataset has unflushed
    stats.  If ``ray.shutdown()`` lands while that thread is mid-``.remote``
    call, the core worker force-exits the whole process with code 1
    ("The core worker has already been shutdown ... The process will
    exit", core_worker_process.cc:926) — pytest/bench dies AFTER all work
    succeeded, with its buffered output lost.  Clearing the pending stats
    makes the thread's loop a no-op sleep, closing the window.
    """
    try:
        from ray.data._internal.stats import StatsManager

        with StatsManager._stats_lock:
            StatsManager._last_execution_stats.clear()
            StatsManager._last_iteration_stats.clear()
    except Exception:
        pass  # private API: degrade to the raw (rarely racy) shutdown
