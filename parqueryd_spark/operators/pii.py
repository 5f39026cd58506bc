"""PII detection and redaction for LLM training-data curation.

A production corpus pipeline must strip personally-identifying strings before
training (emails, phone numbers, IP addresses, national-id-shaped numbers).
Everything here is a pure Column expression over ``regexp_count`` /
``regexp_replace`` — JVM-side, whole-stage-codegen'd, zero Python — so a
100 TB documents table is scanned once with no Arrow transfer and no UDF.

The regexes deliberately use only the RE2-compatible subset (character
classes, bounded repetition, ``\\b``, non-capturing groups; no backreferences
or lookaround) so the same pattern runs identically under Java's regex engine
(Spark), RE2 (DuckDB oracle), and most other engines a redaction audit might
be replayed on.

Reference scope note: the reference engine (parqueryd) has no text-curation
surface; this module is part of the north-star training-pipeline extension
the build brief asks for alongside dedup/similarity/multimodal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters for redaction: SSN-shaped ids run before phones so the
# dashed-digit pattern is not half-eaten by the phone rule.
# Compatibility constraint: these patterns are ALSO interpolated into DuckDB
# oracle SQL (queries/selection.py:_pii_any_sql), whose regex engine is
# RE2-family — keep them to the common subset (no backrefs, no lookaround)
# and prefer avoiding single quotes (escaped defensively on the SQL side).
PII_PATTERNS: dict[str, str] = {
    # user.name+tag@host.tld
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted-quad IPv4 (word-bounded so version strings like 1.2.3.4.5 still
    # match their first four octets rather than silently passing)
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # 123-45-6789 national-id shape
    "id_number": r"\b\d{3}-\d{2}-\d{4}\b",
    # +<cc> <area>-<line> international phone shape
    "phone": r"\+\d{1,3} \d{3}-\d{4}\b",
}

PII_REPLACEMENTS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "id_number": "<ID>",
    "phone": "<PHONE>",
}


def _c(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category PII match counts, one ``regexp_count`` Column each
    (iterate ``PII_PATTERNS`` order for a stable column layout)."""
    t = _c(text)
    return {name: F.regexp_count(t, F.lit(pat)) for name, pat in PII_PATTERNS.items()}


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its ``<CATEGORY>`` placeholder, applying
    the categories in ``PII_PATTERNS`` order (ids before phones — see module
    docstring). Chained ``regexp_replace`` stays inside codegen; the scan
    reads the text column exactly once."""
    out = _c(text)
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, F.lit(pat), F.lit(PII_REPLACEMENTS[name]))
    return out


def has_pii(text: Column | str) -> Column:
    """True when any category matches — the cheap pre-filter: at 100 TB you
    redact only the (typically small) matching fraction and fast-path the
    clean rows untouched."""
    counts = pii_counts(text)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return total > 0


def k_anonymity_violations(
    df, quasi_cols: list[str], k: int = 5
):
    """Quasi-identifier combinations occurring fewer than ``k`` times —
    the groups whose members a release would re-identify (Sweeney's
    k-anonymity). One map-side-combined groupBy over the quasi columns;
    the output is violation-sized (distinct rare combos), never row-sized.
    NULL quasi values form their own combination (SQL GROUP BY semantics:
    "value withheld" is itself identifying).

    Structured-data complement to the regex surface above: redact_pii
    scrubs identifiers INSIDE text, k-anonymity bounds what the released
    ROWS' attribute combinations leak. (Reference parity: no privacy
    surface exists in the reference RPC dispatch —
    /root/reference/parqueryd/controller.py:483-553; north-star curation
    scope.)"""
    from pyspark.sql import functions as F

    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
    )


def k_anonymize(df, quasi_cols: list[str], k: int = 5):
    """Enforce k-anonymity by SUPPRESSION: drop every row whose
    quasi-identifier combination occurs fewer than ``k`` times. Left
    anti-join against the violation set — the join side is
    violation-sized, so AQE broadcasts it when rare combos are rare (the
    normal case) and the kept rows never shuffle. Suppression is the
    conservative mechanism (generalization hierarchies are domain-specific
    — pass pre-generalized columns, e.g. date_trunc'd timestamps or
    zip-code prefixes, and this enforces the floor). The anti-join is
    null-SAFE: GROUP BY treats NULL as a value, so a rare NULL combination
    must suppress too — a plain equi anti-join would let it leak."""
    viol = k_anonymity_violations(df, quasi_cols, k)
    cond = None
    for c in quasi_cols:
        eq = df[c].eqNullSafe(viol[c])
        cond = eq if cond is None else cond & eq
    return df.join(viol, cond, "left_anti")
