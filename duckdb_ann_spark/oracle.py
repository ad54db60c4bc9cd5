"""DuckDB-SQL fragment builders matching our Spark distance expressions.

The driver's correctness gate runs each Spark query next to an ANSI-SQL oracle
in DuckDB and hash-compares values. Floats only hash-match if both engines do
the *same IEEE754 operations in the same order*, so these fragments mirror
`functions/distance.py` exactly: cast elements to DOUBLE, combine pairwise,
fold sequentially left-to-right, seeded with 0.0 on BOTH sides (a
list_prepend'ed seed on the DuckDB side: 0.0+x == x exactly for every x
except -0.0, where the seed normalizes both engines to +0.0 alike; it
also makes empty vectors fold to 0.0 instead of erroring).

Op determinism rules (round-5 lesson): +, -, *, /, sqrt are IEEE-exact
and safe to hash-compare; transcendentals (ln/log/exp/pow) are NOT —
JVM Math.log and libm disagree by 1 ulp for some arguments (observed in
BM25's idf at df=3857). Any hash-gated expression using one must
quantize its output with exact IEEE ops on both sides (the BM25 oracle
uses floor(ln(x)*1e9)/1e9).
"""

from __future__ import annotations

from typing import Sequence

__all__ = ["sql_vector_lit", "sql_l2sq", "sql_neg_ip", "sql_inner_product",
           "sql_cosine_sim", "sql_cosine_dist", "sql_index_distance"]


def sql_vector_lit(vec: Sequence[float]) -> str:
    """A DOUBLE[] literal.

    Scientific notation is mandatory: DuckDB parses plain decimal literals as
    DECIMAL (losing low bits through base-10), but E-notation literals as
    DOUBLE. %.17e round-trips any IEEE754 double exactly.
    """
    return "[" + ", ".join(f"{float(x):.17e}" for x in vec) + "]"


def _zip_fold(a: str, b: str, combine: str) -> str:
    """Pairwise-combine + sequential left fold, mirroring Spark's
    `F.aggregate(F.zip_with(a, b, comb), 0.0, +)` EDGE CASES too:

    * range over the LONGER list (zip_with pads the shorter side with
      NULL → NULL total; DuckDB's out-of-range [i] is NULL likewise) —
      ranging over `a` alone returned a finite distance for a short row
      where Spark returns NULL;
    * seed the fold with 0.0 via list_prepend — a seedless list_reduce
      CRASHES on empty vectors where Spark returns the 0.0 seed, and
      the seed also normalizes an all--0.0 products case to +0.0 the
      way Spark's 0.0 + (-0.0) does (sign-of-zero is hash-visible)."""
    # combine uses placeholders {x} and {y}
    expr = combine.format(x=f"CAST({a}[i] AS DOUBLE)", y=f"CAST({b}[i] AS DOUBLE)")
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, greatest(len({a}), len({b})) + 1), "
        f"i -> {expr})), (acc, v) -> acc + v)"
    )


def sql_l2sq(a: str, b: str) -> str:
    return _zip_fold(a, b, "({x} - {y}) * ({x} - {y})")


def sql_inner_product(a: str, b: str) -> str:
    return _zip_fold(a, b, "{x} * {y}")


def sql_neg_ip(a: str, b: str) -> str:
    return f"-({sql_inner_product(a, b)})"


def sql_cosine_sim(a: str, b: str) -> str:
    dot = sql_inner_product(a, b)
    na = f"sqrt({sql_inner_product(a, a)})"
    nb = f"sqrt({sql_inner_product(b, b)})"
    return f"({dot}) / (({na}) * ({nb}))"


def sql_cosine_dist(a: str, b: str) -> str:
    return f"1.0 - ({sql_cosine_sim(a, b)})"


def sql_index_distance(metric: str, a: str, b: str) -> str:
    m = metric.lower()
    if m == "l2":
        return sql_l2sq(a, b)
    if m == "ip":
        return sql_neg_ip(a, b)
    if m == "cosine":
        return sql_cosine_dist(a, b)
    raise ValueError(f"Unknown metric '{metric}'. Supported: l2, ip, cosine")
