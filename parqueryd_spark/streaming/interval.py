"""Stream-stream interval-OVERLAP join — the streaming face of
``operators/relational.py:interval_join``.

Two event streams carry half-open ``[start, end)`` timestamp intervals
(session windows x campaign windows, speech segments x transcript spans).
Spark's stream-stream join REQUIRES an equality predicate (a pure
theta/range join is rejected at analysis), so the streaming shape reuses the
batch operator's trick: every interval explodes into the
``bucket_width``-sized time buckets it covers and candidates meet in an
EQUI-join on the bucket; the exact overlap predicate filters, and each
surviving pair is emitted from exactly ONE canonical bucket
(``max(floor(a.start/w), floor(b.start/w))``, which both sides provably
cover whenever they overlap) — so append-mode output carries no duplicates
and needs no dedup state.

State stays bounded by TWO declared contracts: watermarks on each side's
``start`` column, and a maximum interval length per side (overlap +
max lengths imply ``b.start ∈ [a.start − max_len_b, a.start + max_len_a]``;
stating that band on the two watermarked columns is what lets Spark expire
join state). Intervals exceeding their declared max length fail fast at
execution (the batch operator's guard posture) instead of silently leaking
state or missing matches.

Equivalence to the batch ``interval_join`` on the same finite inputs is
pinned by tests/test_streaming_interval.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    a: DataFrame,
    b: DataFrame,
    a_range: tuple[str, str],
    b_range: tuple[str, str],
    max_len_a: str,
    max_len_b: str,
    bucket_width: float = 3600.0,
    watermark_a: str = "10 seconds",
    watermark_b: str = "10 seconds",
) -> DataFrame:
    """Join two STREAMING interval tables on overlap. ``a_range``/``b_range``
    name (start, end) timestamp columns; ``max_len_a``/``max_len_b`` are SQL
    interval strings (e.g. ``"1 hour"``) bounding each side's interval
    length; ``bucket_width`` is in SECONDS — choose it near the typical
    interval length (~1-2 buckets per interval), exactly like the batch
    operator. Column names must be disjoint (rename before joining)."""
    common = set(a.columns) & set(b.columns)
    if common:
        raise ValueError(
            f"stream_interval_join requires disjoint column names; shared: {sorted(common)}"
        )
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    w = float(bucket_width)
    a_s, a_e = a_range
    b_s, b_e = b_range

    def prep(df, start, end, max_len, wm, side, bkt_name):
        s, e = F.col(start), F.col(end)
        guard = F.assert_true(
            s.isNull() | e.isNull() | (e <= s + F.expr(f"INTERVAL {max_len}")),
            F.lit(
                f"stream_interval_join: an interval on the {side} side exceeds "
                f"its declared max length ({max_len}) — state bounds would be "
                "violated; raise max_len_" + side
            ),
        ).isNull()
        sec_s = F.unix_micros(s) / 1_000_000.0
        sec_e = F.unix_micros(e) / 1_000_000.0
        return (
            df.where(s.isNotNull() & e.isNotNull() & (s < e))
            .where(guard)
            .withWatermark(start, wm)
            .select(
                "*",
                F.explode(
                    F.sequence(F.floor(sec_s / w), F.floor(sec_e / w))
                ).alias(bkt_name),
            )
        )

    ea = prep(a, a_s, a_e, max_len_a, watermark_a, "a", "__bkt_a")
    eb = prep(b, b_s, b_e, max_len_b, watermark_b, "b", "__bkt_b")
    overlap = (F.col(a_s) < F.col(b_e)) & (F.col(b_s) < F.col(a_e))
    # the explicit band on the two watermarked columns (implied by overlap +
    # the declared max lengths) is what lets Spark expire join state
    band = F.col(b_s).between(
        F.col(a_s) - F.expr(f"INTERVAL {max_len_b}"),
        F.col(a_s) + F.expr(f"INTERVAL {max_len_a}"),
    )
    canonical = (
        F.greatest(
            F.floor(F.unix_micros(F.col(a_s)) / 1_000_000.0 / w),
            F.floor(F.unix_micros(F.col(b_s)) / 1_000_000.0 / w),
        )
        == F.col("__bkt_a")
    )
    return (
        ea.join(
            eb,
            (F.col("__bkt_a") == F.col("__bkt_b")) & overlap & band & canonical,
            "inner",
        )
        .drop("__bkt_a", "__bkt_b")
    )
