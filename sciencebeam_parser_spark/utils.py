"""Executor-side lazy singletons (SURVEY §2A A32).

Reference: utils/lazy.py ``LazyLoaded`` + the wapiti/LibreOffice/tesseract
process-reuse pattern (models/wapiti_model_impl.py:111-121) — expensive
resources (model binaries, sidecar processes, OCR handles) load once per
process and are reused across tasks. In Spark the analog is a module-level
registry keyed by name: each *executor* Python worker initializes the
resource on first UDF call and every subsequent task on that worker reuses
it. ``preload`` mirrors ``preload_on_startup`` (eager init at job start via
a dummy mapPartitions pass).
"""
from __future__ import annotations

import threading
from typing import Any, Callable, Dict

_SINGLETONS: Dict[str, Any] = {}
_LOCK = threading.Lock()


def executor_singleton(name: str, factory: Callable[[], Any]) -> Any:
    """Return the process-wide instance for `name`, creating it on first
    call (thread-safe: Spark python workers can run multiple task threads)."""
    inst = _SINGLETONS.get(name)
    if inst is not None:
        return inst
    with _LOCK:
        inst = _SINGLETONS.get(name)
        if inst is None:
            inst = factory()
            _SINGLETONS[name] = inst
    return inst


def reset_singletons() -> None:
    """Testing hook: drop all cached instances in this process."""
    with _LOCK:
        _SINGLETONS.clear()


def preload(spark, name: str, factory: Callable[[], Any]) -> None:
    """Eagerly initialize an executor singleton on every worker —
    ``preload_on_startup`` (models/model.py:251-269, config.yml) in Spark
    form: one dummy task per core forces ``executor_singleton(name,
    factory)`` before the first real query needs it, so model/sidecar
    startup cost is paid at job start, not inside the first batch."""
    n = spark.sparkContext.defaultParallelism

    def init_partition(it):
        executor_singleton(name, factory)
        return iter(())

    spark.sparkContext.parallelize(range(n), n).mapPartitions(
        init_partition
    ).count()


def repartition_for_python(df, *cols):
    """Co-locate rows by `cols` across EXACTLY defaultParallelism partitions
    for a CPU-bound pandas stage.

    A bare ``repartition(col)`` participates in AQE partition coalescing,
    which sizes partitions by BYTES — a few MB of entity rows collapse into
    one partition, serializing the downstream Python work (measured: the
    TEI sink ran single-threaded, ~10s instead of ~1s at sf0.1). An
    explicit partition count is exempt from coalescing, keeping every core
    busy regardless of how small the shuffled bytes are. On a cluster,
    defaultParallelism scales with total executor cores, so the same call
    stays right at any size.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols)


def checkpoint_big(df, *cols):
    """Materialize a corpus-sized relation for multi-branch reuse.

    Two differences from a bare ``localCheckpoint()``, both learned at the
    100x scale smoke:

    - repartition first (by `cols`, defaultParallelism-wide via
      :func:`repartition_for_python`): explode-derived relations inherit
      the pre-explode scan's input-split sizing, so a handful of tasks
      would each materialize a multi-GB partition.
    - store DISK_ONLY: the default MEMORY_AND_DISK level unrolls
      deserialized rows in the executor heap before spilling; with every
      core concurrently pinning a large partition the JVM OOMs
      (observed: q88 at 100x, GCLocker allocation failures in the
      checkpoint stage). Disk-serialized blocks stream through a bounded
      write buffer instead, and downstream reads pay one deserialization
      pass — amortized when the relation feeds several queries.

    Aggregate-sized relations (vocabularies, centroids, bucket counts)
    should keep plain ``localCheckpoint()``: they are small and re-read
    hot, so the in-memory level is right for them.
    """
    from pyspark import StorageLevel

    if cols:
        df = repartition_for_python(df, *cols)
    return df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)


__all__ = [
    "checkpoint_big",
    "executor_singleton",
    "preload",
    "repartition_for_python",
    "reset_singletons",
]
