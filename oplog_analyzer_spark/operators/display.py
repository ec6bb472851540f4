"""Presentation-layer helpers (console report parity).

P10 — byte-count humanization (EntryAccumulator.java:130-140) and the
formatted report sort order (S8, BaseOplogCommand.java:250-267).  Pure
column expressions so the oracle can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KB = 1024.0
_MB = 1024.0 * 1024
_GB = 1024.0 * 1024 * 1024


def humanize_bytes(col: F.Column | str) -> F.Column:
    b = F.col(col) if isinstance(col, str) else col
    return (
        F.when(b < 1024, F.concat(b.cast("long").cast("string"), F.lit(" B")))
        .when(b < _MB, F.format_string("%.1f KB", b / _KB))
        .when(b < _GB, F.format_string("%.1f MB", b / _MB))
        .otherwise(F.format_string("%.1f GB", b / _GB))
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
