"""Presentation-layer helpers (console report parity).

P10 — byte-count humanization (EntryAccumulator.java:130-140) and the
formatted report sort order (S8, BaseOplogCommand.java:250-267).  Pure
column expressions so the oracle can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KB = 1024
_MB = 1024 * 1024
_GB = 1024 * 1024 * 1024


def _tenths(b: F.Column, divisor: int, unit: str) -> F.Column:
    """One decimal place via exact integer math: round-half-up on
    tenths = (bytes*10 + divisor/2) div divisor.  Engine-exact — binary
    %.1f formatting is NOT (Java HALF_UP vs C printf half-even disagree on
    exactly-representable ties like 1280/1024 = 1.25).  The division is
    done on an exact multiple (t − t mod d) as decimal so no float rounding
    can perturb the quotient at any magnitude."""
    t = (b * F.lit(10) + F.lit(divisor // 2)).cast("decimal(38,0)")
    exact = t - F.pmod(t, F.lit(divisor))  # divisible by divisor
    tenths = (exact / F.lit(divisor)).cast("long")
    whole = ((tenths - F.pmod(tenths, F.lit(10))) / F.lit(10)).cast("long")
    return F.concat(
        whole.cast("string"),
        F.lit("."),
        F.pmod(tenths, F.lit(10)).cast("string"),
        F.lit(f" {unit}"),
    )


def humanize_bytes(col: F.Column | str) -> F.Column:
    """P10 — byte humanization (EntryAccumulator.java:130-140), one decimal
    place, computed with pure integer arithmetic so Spark and any ANSI-SQL
    oracle produce byte-identical strings."""
    b = (F.col(col) if isinstance(col, str) else col).cast("long")
    return (
        F.when(b < _KB, F.concat(b.cast("string"), F.lit(" B")))
        .when(b < _MB, _tenths(b, _KB, "KB"))
        .when(b < _GB, _tenths(b, _MB, "MB"))
        .otherwise(_tenths(b, _GB, "GB"))
    )


def console_report(report: DataFrame, limit: int = 50) -> str:
    """S8 — formatted accumulator table (presentation only; collect is
    bounded by ``limit``)."""
    rows = report.limit(limit).collect()
    if not rows:
        return "(empty report)"
    cols = report.columns
    widths = [
        max(len(c), *(len(str(r[c])) for r in rows)) for c in cols
    ]
    header = "  ".join(c.ljust(w) for c, w in zip(cols, widths))
    lines = [header, "-" * len(header)]
    for r in rows:
        lines.append("  ".join(str(r[c]).ljust(w) for c, w in zip(cols, widths)))
    return "\n".join(lines)
