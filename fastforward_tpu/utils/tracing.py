"""Optional profiling hooks around the scoring hot path.

The reference only wall-clocks ``Index.__call__`` (reference:
``index/base.py:415,462``); here the same timing log exists plus an opt-in
``jax.profiler`` trace: set ``FFTPU_TRACE_DIR=/path`` to capture a device
trace of every scoring call (viewable with TensorBoard / Perfetto).
"""

import os
from contextlib import contextmanager, nullcontext


@contextmanager
def _jax_trace(trace_dir: str):
    import jax

    with jax.profiler.trace(trace_dir):
        yield


def maybe_trace():
    """Context manager: a jax profiler trace when ``FFTPU_TRACE_DIR`` is set."""
    trace_dir = os.environ.get("FFTPU_TRACE_DIR")
    if trace_dir:
        return _jax_trace(trace_dir)
    return nullcontext()


def annotate(name: str):
    """Named trace annotation for a host-side region."""
    try:
        import jax.profiler

        return jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover
        return nullcontext()
