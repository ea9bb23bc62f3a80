"""Python-worker thread hygiene.

Each Spark task gets its own Python worker; with N task threads that's
N worker processes. PyArrow (and OpenMP-backed numpy) default their
internal thread pools to the machine's core count, so N workers spawn
N×cores threads — measured on local[32] to make the fused extraction
stage 5× slower than single-pool execution. Pin the per-worker pools to
1: parallelism belongs to Spark's task scheduler, not to nested pools.

Called lazily at the top of every pandas UDF / mapInPandas function;
idempotent and persistent for reused workers.
"""

from __future__ import annotations

_PINNED = False


def pin_worker_threads() -> None:
    global _PINNED
    if _PINNED:
        return
    try:
        import pyarrow as pa

        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)
    except Exception:
        pass
    _PINNED = True
