"""Per-program XLA compile/cache accounting.

The reference has no compilation phase at all (pure numpy/pandas —
``/root/reference/src/fast_forward/index/base.py`` runs eagerly), so its
cold start is zero.  Ours is dominated by tracing + XLA compilation of the
serving programs, and — over a remote-attached device — by shipping either
the compile RPC or the cached executable across the link.  This module
answers, per jitted program, "was that a persistent-cache hit, and where
did the seconds go?" by listening to JAX's own monitoring events:

- ``/jax/core/compile/jaxpr_trace_duration``        (host tracing)
- ``/jax/core/compile/jaxpr_to_mlir_module_duration`` (lowering)
- ``/jax/core/compile/backend_compile_duration``    (compile OR cache load)
- ``/jax/compilation_cache/cache_hits`` / ``cache_misses``
- ``/jax/compilation_cache/cache_retrieval_time_sec`` (deserialize+load)

Usage::

    with compilestats.collect() as stats:
        index.preload(warm=(512, 1000), serve=(0.2, 10, 22))
    print(stats.report())
"""

import threading
from contextlib import contextmanager
from dataclasses import dataclass, field

_TRACE = "/jax/core/compile/jaxpr_trace_duration"
_LOWER = "/jax/core/compile/jaxpr_to_mlir_module_duration"
_COMPILE = "/jax/core/compile/backend_compile_duration"
_HIT = "/jax/compilation_cache/cache_hits"
_MISS = "/jax/compilation_cache/cache_misses"
_RETRIEVAL = "/jax/compilation_cache/cache_retrieval_time_sec"
_SAVED = "/jax/compilation_cache/compile_time_saved_sec"


@dataclass
class ProgramStats:
    """Accumulated compile-phase seconds for one jitted function name."""

    trace_s: float = 0.0
    lower_s: float = 0.0
    compile_s: float = 0.0  # backend compile OR cache retrieval, whole phase
    compiles: int = 0


@dataclass
class CompileStats:
    """One collection window of JAX compile/cache events."""

    programs: "dict[str, ProgramStats]" = field(default_factory=dict)
    cache_hits: int = 0
    cache_misses: int = 0
    retrieval_s: float = 0.0  # persistent-cache deserialize + device load
    saved_s: float = 0.0  # compile seconds the cache claims it saved

    def _prog(self, fun_name: str) -> ProgramStats:
        return self.programs.setdefault(fun_name, ProgramStats())

    @property
    def total_s(self) -> float:
        return sum(
            p.trace_s + p.lower_s + p.compile_s for p in self.programs.values()
        )

    def report(self) -> str:
        """Human-readable per-program table, biggest cost first."""
        lines = [
            f"compile phases: {self.total_s:.1f}s total across "
            f"{len(self.programs)} programs | persistent cache: "
            f"{self.cache_hits} hits ({self.retrieval_s:.1f}s load, "
            f"{self.saved_s:.1f}s saved), {self.cache_misses} misses",
            f"{'program':<44} {'n':>2} {'trace':>7} {'lower':>7} {'compile':>8}",
        ]
        by_cost = sorted(
            self.programs.items(),
            key=lambda kv: kv[1].trace_s + kv[1].lower_s + kv[1].compile_s,
            reverse=True,
        )
        hidden = 0
        for name, p in by_cost:
            if p.trace_s + p.lower_s + p.compile_s < 0.05:
                hidden += 1
                continue
            lines.append(
                f"{name[:44]:<44} {p.compiles:>2} {p.trace_s:>6.1f}s "
                f"{p.lower_s:>6.1f}s {p.compile_s:>7.1f}s"
            )
        if hidden:
            lines.append(f"(+{hidden} programs under 0.05s each)")
        return "\n".join(lines)


_lock = threading.Lock()
_active: "list[CompileStats]" = []
_registered = False


def _on_event(event: str, **kwargs) -> None:
    with _lock:
        for s in _active:
            if event == _HIT:
                s.cache_hits += 1
            elif event == _MISS:
                s.cache_misses += 1


def _on_duration(event: str, duration_secs: float, **kwargs) -> None:
    fun = str(kwargs.get("fun_name", "?"))
    with _lock:
        for s in _active:
            if event == _TRACE:
                s._prog(fun).trace_s += duration_secs
            elif event == _LOWER:
                s._prog(fun).lower_s += duration_secs
            elif event == _COMPILE:
                p = s._prog(fun)
                p.compile_s += duration_secs
                p.compiles += 1
            elif event == _RETRIEVAL:
                s.retrieval_s += duration_secs
            elif event == _SAVED:
                s.saved_s += duration_secs


def _ensure_registered() -> None:
    global _registered
    with _lock:
        if _registered:
            return
        from jax._src import monitoring

        monitoring.register_event_listener(_on_event)
        monitoring.register_event_duration_secs_listener(_on_duration)
        _registered = True


@contextmanager
def collect():
    """Collect compile/cache events for the duration of the block."""
    _ensure_registered()
    stats = CompileStats()
    with _lock:
        _active.append(stats)
    try:
        yield stats
    finally:
        with _lock:
            _active.remove(stats)
