"""Observability: per-phase synthesis timing + TPU profiler traces.

The reference has no instrumentation (SURVEY.md §5.1 — it *disables* the
torch JIT profiler for speed). Here timing and tracing are first-class:

- `PhaseTimer`: lightweight wall-clock phase accounting; the synthesis
  pipeline records frontend/AR/NAR/vocoder spans into it.
- `trace(dir)`: context manager around jax.profiler for device-level traces
  viewable in TensorBoard/XProf (xprof ships in this image).
- `synthesis_report`: RTF/latency summary from a PhaseTimer.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class PhaseTimer:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, float]:
        return dict(self.totals)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vallex-trace") -> Iterator[None]:
    """Capture a jax.profiler device trace around a code region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def synthesis_report(
    timer: PhaseTimer, audio_seconds: Optional[float] = None
) -> str:
    lines = []
    total = sum(timer.totals.values())
    for name, t in sorted(timer.totals.items(), key=lambda kv: -kv[1]):
        lines.append(
            f"  {name:<12} {t * 1000:8.1f} ms ({t / max(total, 1e-9):5.1%})"
        )
    head = f"synthesis wall {total * 1000:.1f} ms"
    if audio_seconds:
        head += (
            f", audio {audio_seconds:.2f} s, RTF {total / audio_seconds:.4f}"
            f" ({audio_seconds / max(total, 1e-9):.1f}x real-time)"
        )
    return head + "\n" + "\n".join(lines)
