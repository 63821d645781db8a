"""Profiling utilities (SURVEY.md §5.1: trace annotations + per-phase timing
as first-class tools; the reference only had wall-clock bookkeeping in its
examples)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf.

    Engine pipeline stages are annotated with jax.named_scope
    (engine/forward.py), so the trace groups ops by physics phase."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.named_scope  # alias: `with profiling.annotate("rollout"): ...`


class PhaseTimer:
    """Wall-clock per-phase timing with hard device syncs.

    On this platform block_until_ready is not a reliable fence (see README),
    so phases should end by materializing a small value; `sync` does that."""

    def __init__(self) -> None:
        self.times: Dict[str, float] = {}
        self._t0: Optional[float] = None
        self._name: Optional[str] = None

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            self.sync(sync_value)
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    @staticmethod
    def sync(value) -> float:
        """Force completion by reading one scalar back to the host."""
        leaf = jax.tree.leaves(value)[0]
        return float(jax.numpy.ravel(leaf)[0])

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k}: {v:.3f}s ({100 * v / max(total, 1e-9):.0f}%)" for k, v in self.times.items()]
        return "\n".join(lines)
