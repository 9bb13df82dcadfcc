"""Pluggable execution-environment context (§2.11 second half).

Reference analogue: ``Context`` / ``ContextMeta`` / ``DatabricksContext``
(reference context.py:17-90, databricks_context.py:12-59) — there, a
set-once global that abstracts the Spark session, workspace client and
notebook display so checkers never hardcode the runtime.  Here the same
shape abstracts what a Ray Data deployment varies by environment:

- **paths** (``resolve_path``): where table URIs land — local dirs in
  this sandbox, object-store URIs on a real cluster;
- **parallelism** (``parallelism``): the CPU budget stage sizing keys
  off (actor-pool concurrency, shuffle partition counts);
- **sinks** (``metrics_sink``): where health-check payloads go — a
  JSONL file locally, an HTTP endpoint in production (metrics.py K3);
- **display** (``display``): notebook-vs-terminal rendering, the
  reference's ``display()`` hack.

The context NEVER owns the Ray session (the library-wide rule: only
entry points call ``ray.init``); ``parallelism`` reads the session if
one exists and falls back to a constant otherwise.

Set-once semantics match the reference exactly: assigning
``RuntimeContext.current`` twice without ``clear()`` raises, and
``current`` before any assignment raises — pipelines that want a
default use :func:`current_or_default`.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from typing import Any, Callable


class _ContextMeta(ABC.__class__):
    """Set-once ``current`` holder (reference context.py:17-45)."""

    def __init__(cls, *args, **kwargs):
        super().__init__(*args, **kwargs)
        cls._current = None

    @property
    def active(cls) -> bool:
        return cls._current is not None

    @property
    def current(cls):
        if not cls.active:
            raise RuntimeError("No available context")
        return cls._current

    @current.setter
    def current(cls, context) -> None:
        if context is not None and cls.active:
            raise RuntimeError("Context already set")
        cls._current = context

    def clear(cls) -> None:
        cls._current = None


class RuntimeContext(ABC, metaclass=_ContextMeta):
    """Abstract execution-environment surface for pipelines and jobs."""

    @abstractmethod
    def resolve_path(self, path: str) -> str:
        """Map a logical table/output path to a physical URI."""

    @abstractmethod
    def parallelism(self) -> int:
        """CPU budget for stage sizing (actor pools, shuffle fan-out)."""

    @abstractmethod
    def metrics_sink(self, out_root: str) -> Callable[[dict], None]:
        """PUT-body consumer for health-check batches (metrics.py K3)."""

    @abstractmethod
    def display(self, obj: Any) -> None:
        """Render an object for the environment's UI."""


class LocalRayContext(RuntimeContext, metaclass=_ContextMeta):
    """Single-machine / plain-cluster context: local filesystem paths,
    Ray-session CPU count, JSONL health-check sink, stdout display —
    the sandbox stand-in for the reference's DatabricksContext."""

    def __init__(self, path_root: str | None = None,
                 default_cpus: int = 4):
        self._root = path_root
        self._default_cpus = default_cpus

    def resolve_path(self, path: str) -> str:
        if self._root and not os.path.isabs(path) and "://" not in path:
            return os.path.join(self._root, path)
        return path

    def parallelism(self) -> int:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", self._default_cpus))
        return self._default_cpus

    def metrics_sink(self, out_root: str) -> Callable[[dict], None]:
        from anomaly_detection_ray.metrics import file_sink

        return file_sink(os.path.join(out_root, "health_checks.jsonl"))

    def display(self, obj: Any) -> None:
        print(obj)


def current_or_default() -> RuntimeContext:
    """The active context, setting a :class:`LocalRayContext` if none is
    set (the reference's ``if not Context.active: Context.current =
    DatabricksContext()`` idiom, detection.py:44-45)."""
    if not RuntimeContext.active:
        RuntimeContext.current = LocalRayContext()
    return RuntimeContext.current
