"""Expression-level tooling shared by the Column-only operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["bind_once"]


def bind_once(col: Column, fn) -> Column:
    """Evaluate `col` ONCE per row and pass it to `fn` as a bound lambda
    variable.

    Catalyst's CollapseProject inlines column aliases into every
    reference, and interpreted higher-order-function lambdas have no
    common-subexpression elimination — so an expensive array expression
    (a tokenizer regexp split, a shingle builder, an md5 transform)
    referenced k times is re-evaluated k times PER ROW. Wrapping it as
    `transform(array(col), x -> fn(x))[1]` forces a single evaluation;
    every reference inside `fn` is then a cheap variable lookup. Measured
    on the minhash pipeline this is the difference between ~3ms/doc and
    ~100ms/doc of expression time.
    """
    return F.element_at(F.transform(F.array(col), fn), 1)
