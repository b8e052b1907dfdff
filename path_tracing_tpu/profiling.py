"""Profiling & structured telemetry.

Replaces the reference's scattered ``std::chrono`` + ``std::cout`` timing
(main.cpp:405-419, bdpt_cu.cu:600-655, cpu_bdpt.cpp:326-328) with one timer
that brackets device work with ``block_until_ready`` and emits structured
JSONL rows (SURVEY.md §5 "Tracing / profiling").  ``jax.profiler`` traces can
be layered on via ``trace_dir``.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Any


@dataclass
class Telemetry:
    path: str | None = None
    rows: list = field(default_factory=list)

    def emit(self, **row: Any) -> None:
        row.setdefault("t", time.time())
        self.rows.append(row)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(row) + "\n")

    @contextlib.contextmanager
    def phase(self, name: str, paths: int = 0, **extra):
        """Time a device phase; pass the result through block_until_ready
        before the context exits for honest wall-clock."""
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        row = {"phase": name, "ms": round(dt * 1000, 3), **extra}
        if paths:
            row["mpaths_per_s"] = round(paths / dt / 1e6, 3)
        self.emit(**row)


@contextlib.contextmanager
def maybe_jax_trace(trace_dir: str | None):
    if trace_dir:
        import jax
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
