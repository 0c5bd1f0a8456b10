"""Higher-order-function helpers.

Catalyst does NOT common-subexpression-eliminate inside lambda bodies:
a lambda that references an outer Column *expression* (rather than a
bound attribute or lambda variable) re-evaluates that expression for
EVERY element — turning an O(n) construction like
``transform(sequence(...), i -> element_at(split(text), i))`` into
O(n^2) per row (measured: 8k-token docs took 4x the time of 4k-token
docs before this fix). :func:`let1` binds an expression to a lambda
variable via a single-element ``transform``, so the body sees an O(1)
variable reference and the expression is evaluated exactly once per
row. Nested lambdas see the binding too (NamedLambdaVariable lookup).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let1(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row and make it available to ``body``
    as a lambda variable — the expression-level analogue of projecting
    it into a column first. Use whenever a HOF lambda would otherwise
    close over an expensive outer expression."""
    return F.element_at(F.transform(F.array(value), body), 1)


def unpack_once(df, passthrough: list[str], struct_col: Column, fields: list[str]):
    """Evaluate ``struct_col`` ONCE per row and return ``df`` projected
    to the passthrough columns plus every named struct field as a
    top-level column.

    The naive ``select(s["a"], s["b"], …)`` is NOT equivalent in cost:
    CollapseProject + SimplifyExtractValueOps re-inline the whole
    struct expression into every extracted field, multiplying the
    struct's work by its field count — and cross-COLUMN subexpression
    elimination does not rescue lambda-bearing expressions (they fall
    out of whole-stage codegen and lambda-variable IDs defeat
    canonical matching; q_gopher_rules measured 15 re-evaluations of
    one tokenization). ``explode(array(struct))`` places a Generate
    attribute boundary the optimizer cannot collapse through, so the
    struct is computed exactly once per row. Row count is unchanged
    (the generated array always has exactly one element; a NULL struct
    yields one all-NULL-fields row, matching field-extraction
    semantics on a NULL struct)."""
    gen = df.select(*passthrough, F.explode(F.array(struct_col)).alias("__s__"))
    return gen.select(*passthrough, *[F.col("__s__")[f].alias(f) for f in fields])
