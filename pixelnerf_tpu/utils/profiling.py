"""Profiling / tracing hooks.

The reference annotates its hot paths with torch profiler scopes
(models.py:156, encoder.py:90, resnetfc.py:54, nerf.py:175 — SURVEY §5.1)
but ships no driver. Here both exist: ``named_scope`` annotations compile
into the XLA HLO (visible in traces), and ``trace`` dumps a
TensorBoard-viewable profile for any code region (the ``--profile_dir``
flag on the CLI apps).
"""
from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA trace into ``profile_dir`` (no-op when None).

    View with: tensorboard --logdir <profile_dir>
    """
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator version of named_scope."""
    def wrap(fn):
        def inner(*args, **kwargs):
            with jax.named_scope(name):
                return fn(*args, **kwargs)
        return inner
    return wrap
