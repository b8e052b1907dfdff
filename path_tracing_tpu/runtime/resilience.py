"""Failure detection and recovery for long progressive renders.

The reference has no failure handling at all — a CUDA fault mid-render
loses the whole accumulation (``src/main.cpp`` render loop just dies).  On
this TPU deployment the observed failure modes are sharper: a previously
killed client can leave the chip *wedged* so that the next op neither
completes nor raises (an indefinite hang, not an exception), and transient
``FAILED_PRECONDITION`` / tunnel errors surface as exceptions on an
otherwise healthy program.  This module provides the two matching
defenses:

- :func:`probe_device` — run a trivial jitted op with a *host read* on a
  watchdog thread.  A healthy chip answers in milliseconds; a wedged one
  hangs, which the probe converts into ``False`` after ``timeout_s``.
  (The host read matters: ``block_until_ready`` does not block through the
  tunneled TPU, so only a device->host transfer proves liveness.)
- :class:`RenderSupervisor` — drive a per-iteration render callable with
  bounded retries.  On an exception it snapshots the accumulated state via
  the caller's checkpoint hook (progress is never lost), clears jax's
  trace/compile caches (a stale executable pinned to a restarted backend
  is itself a failure mode), and re-runs the same iteration.  Failures are
  counted per *iteration*, so one flaky pass cannot burn the whole budget.

The CLI wires this behind ``--retries`` (default 1 retry) and the bench
driver reuses :func:`probe_device` before timing.
"""
from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable


def probe_device(timeout_s: float = 30.0) -> bool:
    """True iff the default jax backend completes a trivial op + host read
    within ``timeout_s``.  Never raises; a hang, an exception, and a wrong
    answer all report unhealthy."""
    result: list[bool] = []

    def work():
        try:
            import jax
            import jax.numpy as jnp

            x = jax.jit(lambda v: v * 2.0 + 1.0)(jnp.float32(20.5))
            result.append(abs(float(x) - 42.0) < 1e-6)
        except Exception:
            result.append(False)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(result) and result[0]


class StopRender(BaseException):
    """Graceful early-stop request from inside ``on_frame`` (e.g. the
    CLI's SIGUSR2 handler).  Derives from BaseException so the
    supervisor's device-fault retry loop (``except Exception``) passes it
    through instead of re-running the iteration."""


@dataclass
class RenderSupervisor:
    """Retrying driver for a progressive render loop.

    ``run(frame, start, iters, on_frame)`` calls ``frame(i)`` for each
    iteration, passing the realized result to ``on_frame(i, value)`` (the
    accumulation step).  If ``frame`` or ``on_frame`` raises, the
    supervisor calls ``checkpoint()`` (if given), ``jax.clear_caches()``,
    waits ``backoff_s`` and retries the same iteration up to
    ``max_retries`` times before re-raising the last error.
    """

    max_retries: int = 1
    backoff_s: float = 2.0
    checkpoint: Callable[[], None] | None = None
    log: Callable[[str], None] = print
    failures: int = field(default=0, init=False)

    def run(self, frame: Callable[[int], Any], start: int, iters: int,
            on_frame: Callable[[int, Any], None]) -> None:
        for i in range(start, start + iters):
            attempts = 0
            while True:
                try:
                    on_frame(i, frame(i))
                    break
                except KeyboardInterrupt:
                    raise
                except Exception as e:  # noqa: BLE001 — any device fault
                    self.failures += 1
                    attempts += 1
                    self._salvage(i, e)
                    if attempts > self.max_retries:
                        raise
                    time.sleep(self.backoff_s)

    def _salvage(self, i: int, err: Exception) -> None:
        self.log(f"[Recover] iter {i + 1} failed: {type(err).__name__}: "
                 f"{err}")
        if self.checkpoint is not None:
            try:
                self.checkpoint()
                self.log("[Recover] accumulation checkpointed")
            except Exception as ce:  # noqa: BLE001
                self.log(f"[Recover] checkpoint also failed: {ce}")
        try:
            import jax

            jax.clear_caches()
        except Exception:  # noqa: BLE001 — clearing caches is best-effort
            pass
