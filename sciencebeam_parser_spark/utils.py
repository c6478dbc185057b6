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


__all__ = ["executor_singleton", "reset_singletons"]
