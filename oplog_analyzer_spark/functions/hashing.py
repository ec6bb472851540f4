"""The ONE seeded-hash expression shared by sampling, dedup, and packing.

Two families, selected by ``hash_fn``:

* ``"xxhash64"`` — JVM-native, fastest, full signed-64 range; the
  production default.  No twin in other engines.
* ``"md5"`` — first 8 hex digits of ``md5("<seed>:<value>")`` parsed
  base-16 (non-negative, < 2^32).  Byte-identical in any engine with a
  standard md5 — the DuckDB twin is
  ``CAST(('0x' || substr(md5('<seed>:' || CAST(v AS VARCHAR)), 1, 8)) AS
  BIGINT)`` — which is what makes every md5-mode assignment certifiable
  by SQL oracle.

This expression is the load-bearing contract for oracle certification
(entry_queries' generated SQL must reproduce it bit-for-bit), so it lives
in exactly one place; don't re-inline it.

NULL semantics: a NULL input hashes to NULL in BOTH families — matching
the SQL twin, where ``'seed:' || NULL`` is NULL (``concat_ws`` would
silently drop the NULL operand and hash the seed alone, collapsing every
NULL id into one deterministic bucket that no SQL oracle reproduces).
Downstream this means NULL ids take the fall-through split label (CASE
``ELSE`` — same in Spark and SQL), drop out of hash-threshold filters,
and group under the NULL packing bucket; callers wanting different
treatment should coalesce ids first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_FNS = ("xxhash64", "md5")


def seeded_hash(seed: int | str, col: Column, hash_fn: str = "xxhash64") -> Column:
    """Long-typed seeded hash of ``col``; NULL iff the input is NULL."""
    if hash_fn == "xxhash64":
        # xxhash64 skips NULL operands (hashing the seed alone) — gate it
        # so both families agree that NULL hashes to NULL
        return F.when(
            col.isNull(), F.lit(None).cast("long")
        ).otherwise(F.xxhash64(F.lit(seed), col))
    if hash_fn == "md5":
        # F.concat (unlike concat_ws) propagates NULL, as '||' does in SQL
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string"))), 1, 8),
            16, 10,
        ).cast("long")
    raise ValueError(f"hash_fn must be one of {HASH_FNS}, got {hash_fn!r}")


def seeded_hash_col(seed: Column, col: Column, hash_fn: str = "xxhash64") -> Column:
    """``seeded_hash`` with the seed itself a COLUMN — e.g. the lambda
    variable of a ``transform`` over ``F.sequence(0, n-1)``, which lets a
    family of n seeded hashes ride ONE expression instead of n stamped
    copies (minhash signatures went from an O(num_hashes × shingle-expr)
    tree that took seconds per 500 rows to an O(1) tree this way).

    Value contract: identical to ``seeded_hash(i, col)`` for every int i —
    ``F.sequence`` over int literals yields IntegerType elements, the same
    type ``F.lit(int)`` produces, so xxhash64 (which hashes by input type)
    agrees; the md5 family concatenates the seed's decimal string exactly
    like the ``f"{seed}:"`` literal.  Equivalence is pinned in
    tests/test_functions.py."""
    if hash_fn == "xxhash64":
        return F.when(
            col.isNull(), F.lit(None).cast("long")
        ).otherwise(F.xxhash64(seed, col))
    if hash_fn == "md5":
        return F.conv(
            F.substring(
                F.md5(F.concat(seed.cast("string"), F.lit(":"), col.cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
    raise ValueError(f"hash_fn must be one of {HASH_FNS}, got {hash_fn!r}")
