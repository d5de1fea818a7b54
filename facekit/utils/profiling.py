"""jax.profiler integration (the reference has none — SURVEY.md §5.1).

Usage: ``with profile_trace("/tmp/facekit-trace"): pipe.recognize_frame(f)``
then open the trace in TensorBoard/Perfetto/xprof.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def profile_trace(logdir: str, create_perfetto_link: bool = False):
    import jax

    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
