"""Tracing & per-stage wall-clock reporting.

The reference has no profiling (SURVEY.md §5 — tqdm progress only); here
every pipeline stage can be timed and the whole run can be captured with
jax.profiler for tensorboard.

Usage:
    from depthmap_tpu.utils.profiling import stage, report
    with stage("depth_predict"):
        ...
    print(report())

    with trace("/tmp/jax-trace"):      # tensorboard-profile capture
        ...
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

_TIMINGS: Dict[str, list] = defaultdict(list)
_ENABLED = True


def enable(flag: bool = True) -> None:
    global _ENABLED
    _ENABLED = flag


def reset() -> None:
    _TIMINGS.clear()


@contextlib.contextmanager
def stage(name: str) -> Iterator[None]:
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _TIMINGS[name].append(time.perf_counter() - t0)


def timings() -> Dict[str, list]:
    return dict(_TIMINGS)


def report() -> str:
    lines = ["stage                      calls   total(s)   mean(ms)"]
    for name, ts in sorted(_TIMINGS.items(), key=lambda kv: -sum(kv[1])):
        lines.append(f"{name:<26} {len(ts):>5}   {sum(ts):8.3f}   "
                     f"{1000 * sum(ts) / len(ts):8.2f}")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """jax.profiler capture (view with tensorboard-plugin-profile)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
