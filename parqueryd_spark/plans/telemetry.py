"""Shuffle-volume telemetry (VERDICT r11 item #3).

Wall time at sf0.1 cannot see the one 100 TB axis that matters most on a
real cluster: SHUFFLE BYTES. A regression that, say, starts carrying document
text through the substring-dedup digest shuffle is invisible in local wall
time (memory-speed "network") but catastrophic at cluster scale. This module
reads cumulative shuffle read/write bytes from Spark's AppStatusStore — the
same numbers the UI's stage page shows — so the bench can publish per-query
shuffle volume alongside wall time and pytest can pin "text never crosses a
shuffle" contracts to byte budgets.

Implementation note: PySpark exposes no listener API, but the driver-local
``SparkContext.statusStore`` does; ``stageList`` is called through py4j with
every default argument spelled out (py4j cannot use Scala defaults). The
store retains a bounded number of stages (spark.ui.retainedStages, default
1000), so deltas taken around a single query are exact while whole-session
totals may undercount on very long sessions — the bench takes per-query
deltas.
"""

from __future__ import annotations


def shuffle_bytes(spark) -> tuple[int, int]:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) across all stages
    currently retained by the driver's status store. The async listener bus
    is drained first (the store is fed by AppStatusListener; right after an
    action returns, the job's tail task/stage-end events can still be
    queued — Spark's own tests waitUntilEmpty before asserting on this
    store), so a delta taken around a completed action is exact."""
    sc = spark.sparkContext
    jvm = sc._gateway.jvm
    try:
        sc._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    except Exception:
        # older signature without timeout / relocated API: best effort —
        # the numbers degrade to eventually-consistent, never wrong-sign
        try:
            sc._jsc.sc().listenerBus().waitUntilEmpty()
        except Exception:
            pass
    store = sc._jsc.sc().statusStore()
    seq = store.stageList(
        jvm.java.util.ArrayList(),          # statuses: all
        False,                              # details
        False,                              # withSummaries
        sc._gateway.new_array(jvm.double, 0),  # unsortedQuantiles
        jvm.java.util.ArrayList(),          # taskStatus
    )
    rd = wr = 0
    it = seq.iterator()
    while it.hasNext():
        s = it.next()
        rd += s.shuffleReadBytes()
        wr += s.shuffleWriteBytes()
    return rd, wr


class ShuffleDelta:
    """Context manager: ``with ShuffleDelta(spark) as d: ...`` then
    ``d.read`` / ``d.write`` / ``d.total`` are the bytes shuffled by the
    enclosed work (driver-local, exact for the enclosed jobs)."""

    def __init__(self, spark):
        self._spark = spark
        self.read = 0
        self.write = 0

    def __enter__(self):
        self._r0, self._w0 = shuffle_bytes(self._spark)
        return self

    def __exit__(self, *exc):
        r1, w1 = shuffle_bytes(self._spark)
        self.read = r1 - self._r0
        self.write = w1 - self._w0
        return False

    @property
    def total(self) -> int:
        return self.read + self.write
