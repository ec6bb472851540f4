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


def console_report(
    report: DataFrame, limit: int = 50, style: str = "plain",
    buckets: tuple[int, ...] = (),
) -> str:
    """S8 — formatted accumulator table (presentation only; collect is
    bounded by ``limit``).  ``style="reference"`` renders the reference's
    exact column layout (EntryAccumulator.java:77-177) for A1/A3-shaped
    reports; anything else gets the generic aligned table."""
    if style == "reference":
        return reference_report(report, buckets=buckets, limit=limit)
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


# --- S8 byte-exact reference layout (EntryAccumulator.java:77-177) --------

def _size_with_precision(n: int) -> str:
    """formatSizeWithPrecision (EntryAccumulator.java:130-140): `N B`
    below 1 KB, else one decimal in KB/MB/GB.  Java's %.1f rounds
    HALF_UP; integer-tenths math reproduces it exactly."""
    if n < _KB:
        return f"{n} B"
    for divisor, unit in ((_KB, "KB"), (_MB, "MB"), (_GB, "GB")):
        if n < divisor * 1024 or unit == "GB":
            tenths = (n * 10 + divisor // 2) // divisor
            return f"{tenths // 10}.{tenths % 10} {unit}"
    raise AssertionError("unreachable")


def _byte_count_display(n: int) -> str:
    """Apache commons-io byteCountToDisplaySize as the reference uses it
    for the total column (EntryAccumulator.java:79): integer FLOOR
    division to the largest unit ≥ 1, `N bytes` below 1 KB."""
    for divisor, unit in (
        (1 << 60, "EB"), (1 << 50, "PB"), (1 << 40, "TB"),
        (_GB, "GB"), (_MB, "MB"), (_KB, "KB"),
    ):
        if n // divisor > 0:
            return f"{n // divisor} {unit}"
    return f"{n} bytes"


def _truncate_ns(ns: str, max_width: int) -> str:
    """truncateNamespace (EntryAccumulator.java:117-128): middle
    truncation keeping the beginning and end."""
    if len(ns) <= max_width:
        return ns
    keep_start = max(15, max_width // 3)
    keep_end = max(10, max_width // 4)
    if keep_start + keep_end + 3 >= max_width:
        return ns[: max_width - 3] + "..."
    return ns[:keep_start] + "..." + ns[len(ns) - keep_end:]


def reference_report(
    report: DataFrame,
    buckets: tuple[int, ...] = (),
    namespace_width: int = 50,
    limit: int = 1000,
) -> str:
    """Byte-exact reference accumulator table: header + separator from
    EntryAccumulator.getHeaderFormat/getSeparatorLine (java:145-176), one
    toString(50) row per (ns, op) sorted by total desc (the report() loop,
    BaseOplogCommand.java:258-261).

    Expects an A1/A3-shaped report (ns, op, count, total_size, min_size,
    max_size [+ gt_<t> bucket columns, + element/diff sums]).  Avg is
    total/count INTEGER division before humanization
    (EntryAccumulator.java:82); counts print with US thousands grouping.
    """
    rows = report.limit(limit).collect()
    cols = set(report.columns)
    bucket_cols = [(t, f"gt_{t}") for t in buckets if f"gt_{t}" in cols]

    def fixed(ns, op, count, mn, mx, avg, total):
        return (
            f"{ns:<{namespace_width}} {op:>2} {count:>10} {mn:>10} "
            f"{mx:>10} {avg:>10} {total:>12}"
        )

    header = fixed("Namespace", "op", "count", "min", "max", "avg", "total size")
    header += f" {'avg elems':>10} {'avg diffs':>10}"
    sep = fixed("=" * namespace_width, "==", "=" * 10, "=" * 10, "=" * 10,
                "=" * 10, "=" * 12)
    sep += f" {'=' * 10:>10} {'=' * 10:>10}"
    for t, _c in bucket_cols:
        header += f" {'> ' + _byte_count_display(t):>10}"
        sep += f" {'=' * 10:>10}"
    lines = [header, sep]
    for r in sorted(rows, key=lambda r: (-r["total_size"], r["ns"], r["op"])):
        line = fixed(
            _truncate_ns(r["ns"], namespace_width),
            r["op"],
            f"{r['count']:,}",
            _size_with_precision(r["min_size"]),
            _size_with_precision(r["max_size"]),
            _size_with_precision(r["total_size"] // r["count"]),
            _byte_count_display(r["total_size"]),
        )
        docs_e = r["documents_with_elements"] if "documents_with_elements" in cols else 0
        docs_d = r["documents_with_diff"] if "documents_with_diff" in cols else 0

        def ratio_tenths(total: int, docs: int) -> str:
            # Java %.1f applies HALF_UP to the BINARY double totalElements/
            # documentsWithElements, not to the exact rational — for decimal
            # ties not representable in binary the two diverge (ADVICE r03:
            # 7/20 → double 0.3499999999999999778 → Java prints "0.3", the
            # exact-rational form printed "0.4").  Decimal(float) captures
            # the double's exact expansion; quantize replicates Java.
            from decimal import ROUND_HALF_UP, Decimal

            d = Decimal(total / docs).quantize(
                Decimal("0.1"), rounding=ROUND_HALF_UP
            )
            return str(d)

        line += (
            f" {ratio_tenths(r['total_elements'], docs_e):>10}"
            if docs_e else f" {'N/A':>10}"
        )
        line += (
            f" {ratio_tenths(r['total_diff_fields'], docs_d):>10}"
            if docs_d else f" {'N/A':>10}"
        )
        for _t, c in bucket_cols:
            line += f" {r[c]:>10,}"
        lines.append(line)
    return "\n".join(lines)
