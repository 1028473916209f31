"""Memory-adaptive wave sizing — the Spark analog of the reference's
``MemoryAdaptiveDispatcher`` (``crawl4ai/async_dispatcher.py:148-208``).

The reference throttles an asyncio session pool against process memory:
enter "pressure mode" at ``memory_threshold_percent``, dispatch nothing at
``critical_threshold_percent`` (requeue + wait), recover below
``recovery_threshold_percent``, and raise ``MemoryError`` after
``memory_wait_timeout`` seconds of sustained pressure.

In a batch-iterated Spark crawl the executor task pool is the JVM's
business (Tungsten memory manager + AQE), so the knob the driver actually
owns is the WAVE SIZE: how many URLs the politeness rank is allowed to
select this iteration. ``MemoryAdaptiveGovernor`` re-expresses the
reference's state machine at that level:

  - between waves the driver samples memory (system ``/proc/meminfo``
    MemAvailable — the same "true memory" signal the reference's
    ``get_true_memory_usage_percent`` reads — combined with Spark's
    executor storage-memory occupancy from ``getExecutorMemoryStatus``);
  - ≥ critical        → wait (sleep/poll) before building the wave, so
                         in-flight state can drain; memory sustained at or
                         above ``memory_threshold_percent`` (not just
                         critical) past ``memory_wait_timeout`` raises
                         MemoryError exactly like the reference;
  - ≥ threshold       → shrink the next wave's global row cap (×shrink,
                         floored at ``min_wave_rows``);
  - ≤ recovery        → regrow (×grow, capped at ``max_wave_rows``).

Capping a wave never loses URLs: unselected rows simply stay pending in
the frontier (the same no-mutation capacity-trim contract as
``rank_by_host_budget``'s global limit), so a governed crawl fetches the
same final URL-seen set as an ungoverned one — just across more waves.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable


def system_memory_percent() -> float:
    """System memory utilisation from ``/proc/meminfo`` (MemAvailable) —
    the signal the reference's psutil-based monitor measures. Returns 0.0
    where unreadable (non-Linux), i.e. fail-open: never throttles."""
    try:
        info = {}
        with open("/proc/meminfo") as fh:
            for line in fh:
                name, _, rest = line.partition(":")
                info[name] = int(rest.split()[0])
        total = info["MemTotal"]
        avail = info.get("MemAvailable", total)
        return 100.0 * (total - avail) / total if total else 0.0
    except (OSError, KeyError, ValueError, IndexError):
        return 0.0


def executor_storage_percent(spark) -> float:
    """Spark executor storage-memory occupancy (cached blocks vs capacity)
    across all block managers, via ``SparkContext.getExecutorMemoryStatus``
    — the cluster-side pressure the driver's /proc can't see. Fail-open
    0.0 on any py4j surprise."""
    try:
        jmap = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
        it = jmap.iterator()
        total = used = 0
        while it.hasNext():
            kv = it.next()
            mem = kv._2()  # (maxMem, remainingMem)
            mx, remaining = mem._1(), mem._2()
            total += mx
            used += mx - remaining
        return 100.0 * used / total if total else 0.0
    except Exception:  # noqa: BLE001 — monitoring must never kill the crawl
        return 0.0


@dataclass
class MemoryAdaptiveGovernor:
    """Per-wave row-cap state machine (see module docstring).

    ``memory_percent_fn`` is injectable for tests and for callers with a
    better signal (e.g. executor JMX on a real cluster); the default
    samples max(system, executor-storage) at each wave boundary.
    """

    memory_threshold_percent: float = 90.0
    critical_threshold_percent: float = 95.0
    recovery_threshold_percent: float = 85.0
    max_wave_rows: int = 1_000_000
    min_wave_rows: int = 1_000
    shrink: float = 0.5
    grow: float = 1.5
    check_interval: float = 1.0
    memory_wait_timeout: float | None = 600.0
    memory_percent_fn: Callable[[], float] | None = None
    # runtime state
    current_cap: int = field(init=False)
    memory_pressure_mode: bool = field(init=False, default=False)
    last_memory_percent: float = field(init=False, default=0.0)
    _pressure_since: float | None = field(init=False, default=None)

    def __post_init__(self):
        if not self.min_wave_rows <= self.max_wave_rows:
            raise ValueError("min_wave_rows must be <= max_wave_rows")
        self.current_cap = self.max_wave_rows

    def _sample(self, spark=None) -> float:
        if self.memory_percent_fn is not None:
            pct = float(self.memory_percent_fn())
        else:
            pct = system_memory_percent()
            if spark is not None:
                pct = max(pct, executor_storage_percent(spark))
        self.last_memory_percent = pct
        # memory_wait_timeout clock: the reference raises after sustained
        # time above memory_threshold_percent (90), NOT only at critical —
        # a crawl pinned at 92% must still time out. The clock spans wave
        # boundaries (samples are the observation points, like the
        # reference's periodic monitor task) and resets the moment a
        # sample drops below the pressure threshold.
        if pct >= self.memory_threshold_percent:
            now = time.time()
            if self._pressure_since is None:
                self._pressure_since = now
            elif (
                self.memory_wait_timeout is not None
                and now - self._pressure_since >= self.memory_wait_timeout
            ):
                raise MemoryError(
                    f"memory {pct:.1f}% >= threshold "
                    f"{self.memory_threshold_percent}% for "
                    f"{self.memory_wait_timeout}s — aborting crawl (reference "
                    "MemoryAdaptiveDispatcher memory_wait_timeout semantics)"
                )
        else:
            self._pressure_since = None
        return pct

    def wait_if_critical(self, spark=None) -> float:
        """Block (sleep/poll) while memory is ≥ critical. The sustained-
        pressure ``MemoryError`` fires from the sampling clock (see
        ``_sample``) once memory has stayed ≥ ``memory_threshold_percent``
        for ``memory_wait_timeout`` seconds (None = wait forever).
        Returns the final (sub-critical) sample."""
        pct = self._sample(spark)
        while pct >= self.critical_threshold_percent:
            time.sleep(self.check_interval)
            pct = self._sample(spark)
        return pct

    def next_wave_cap(self, pct: float | None = None, spark=None) -> int:
        """Adapt the global row cap for the next wave from a memory
        sample. Call once per wave boundary, passing the percent returned
        by :meth:`wait_if_critical` (pass None to take a fresh sample)."""
        if pct is None:
            pct = self._sample(spark)
        if pct >= self.memory_threshold_percent:
            self.memory_pressure_mode = True
            self.current_cap = max(int(self.current_cap * self.shrink), self.min_wave_rows)
        elif pct <= self.recovery_threshold_percent:
            self.current_cap = min(int(self.current_cap * self.grow), self.max_wave_rows)
            if self.current_cap >= self.max_wave_rows:
                self.memory_pressure_mode = False
        # between recovery and threshold: hold the cap (hysteresis band)
        return self.current_cap
