"""Phase timers (tracing/profiling subsystem).

Reference analog: the Instant-based wall-clock phase timers around k-mer
generation/conversion (index.rs:161-172,212-224), chaining (map.rs:47,112)
and alignment substeps (align.rs:68-98).  Unlike the reference's
unconditional println! debugging (which would destroy TPU throughput),
everything here is opt-in via logging level or explicit collection.
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

log = logging.getLogger(__name__)


class PhaseTimer:
    """Accumulates wall-clock per named phase; logs at INFO."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextmanager
    def phase(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            log.info("%s took: %d ms", name, dt * 1000)

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v*1000:.1f}ms/{self.counts[k]}x" for k, v in self.totals.items()
        )


@contextmanager
def jax_profile(out_dir: str):
    """Optional XLA trace capture (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
