"""Per-worker-process state for STATELESS task stages.

Ray Data actor pools pay a fresh actor spawn (+CPU reservation) on every
pipeline execution — measured ~1-1.5 s per execution on this sandbox, which
dwarfs cheap per-stage setup like hash coefficients or a stopword set
(CLAUDE.md env facts: two min-2 actor pools deadlock a 4-cpu node; a
one-actor-per-cpu pool evicts Ray's idle Data workers).  Actor pools are
reserved for HEAVY state (BM25Scorer's index, model weights).

``task_fn(Cls, **kwargs)`` wraps a callable class as a plain task function:
the instance is built once per worker PROCESS (module-level cache, reused
across pipeline executions because Ray reuses warm workers) and the stage
schedules as an elastic task pool — no reservation, no respawn.
"""

from __future__ import annotations

_INSTANCES: dict = {}


def task_fn(cls, **kwargs):
    """Stateless-task wrapper for a cheap-state callable class.

    The returned closure pickles (cls, kwargs) per task; on first call in a
    worker process it instantiates and caches.  Only use for state that is
    small and deterministic to rebuild — heavy state stays an actor pool.
    """
    key = (f"{cls.__module__}.{cls.__qualname__}", tuple(sorted(kwargs.items())))

    def fn(batch):
        inst = _INSTANCES.get(key)
        if inst is None:
            inst = _INSTANCES[key] = cls(**kwargs)
        return inst(batch)

    fn.__name__ = fn.__qualname__ = f"task[{cls.__name__}]"
    return fn
