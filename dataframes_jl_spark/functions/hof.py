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
