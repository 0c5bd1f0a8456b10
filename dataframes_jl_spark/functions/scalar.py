"""Scalar/columnar function surface (reference src/operators.jl).

The reference lifts ~50 scalar functions elementwise over columns via
macros (@dataframe_unary/@dataframe_binary, src/operators.jl:131-150).
Here the same surface is a table from reference name → native Spark
Column function — everything stays inside whole-stage codegen. The few
functions Spark lacks (digamma, erf/erfc, gamma) fall back to an
Arrow-batched pandas UDF, the documented slow path.
"""

from __future__ import annotations

import math
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


# --- pandas_udf fallbacks for functions with no JVM builtin ---------------
# Registered lazily: pandas_udf needs an active SparkSession, which does
# not exist at import time.
_UDF_CACHE: dict[str, Callable] = {}


def _scalar_map(fn):
    def impl(s: pd.Series) -> pd.Series:
        return s.map(lambda x: fn(x) if pd.notna(x) else None)

    return impl


def _vectorized(scipy_name: str, math_fn):
    """Prefer the scipy vectorized kernel (C loop over the whole Arrow
    batch); fall back to the per-element math.* map only when scipy is
    absent. Null-safe: scipy kernels propagate NaN, which round-trips to
    NULL through Arrow, matching the map fallback."""
    mapped = _scalar_map(math_fn)

    def impl(s: pd.Series) -> pd.Series:
        try:
            import scipy.special as sp  # gated import
        except ImportError:  # pragma: no cover
            return mapped(s)
        return pd.Series(getattr(sp, scipy_name)(s.astype(float)))

    return impl


def _digamma_impl(s: pd.Series) -> pd.Series:
    try:
        from scipy.special import digamma as dg  # gated import

        return pd.Series(dg(s.astype(float)))
    except ImportError:  # pragma: no cover
        raise NotImplementedError("digamma requires scipy")


_UDF_IMPLS = {
    "gamma": _vectorized("gamma", math.gamma),
    "lgamma": _vectorized("gammaln", math.lgamma),
    "erf": _vectorized("erf", math.erf),
    "erfc": _vectorized("erfc", math.erfc),
    "digamma": _digamma_impl,
}


def _lazy_udf(name: str):
    def apply(c: Column) -> Column:
        if name not in _UDF_CACHE:
            _UDF_CACHE[name] = pandas_udf("double")(_UDF_IMPLS[name])
        return _UDF_CACHE[name](c)

    return apply


def _exponent(c: Column) -> Column:
    # binary exponent of a float (reference exports `exponent`)
    return F.floor(F.log2(F.abs(c))).cast("int")


# reference name → Column-function (reference src/operators.jl:7-14)
FUNCTION_TABLE: dict[str, Callable[[Column], Column]] = {
    "abs": F.abs,
    "sign": F.signum,
    "acos": F.acos,
    "acosh": F.acosh,
    "asin": F.asin,
    "asinh": F.asinh,
    "atan": F.atan,
    "atanh": F.atanh,
    "sin": F.sin,
    "sinh": F.sinh,
    "cos": F.cos,
    "cosh": F.cosh,
    "tan": F.tan,
    "tanh": F.tanh,
    "ceil": F.ceil,
    "floor": F.floor,
    "round": F.round,
    "trunc": lambda c: F.expr(f"CAST({_sql(c)} AS BIGINT)"),
    "exp": F.exp,
    "exp2": lambda c: F.pow(F.lit(2.0), c),
    "expm1": F.expm1,
    "log": F.log,
    "log10": F.log10,
    "log1p": F.log1p,
    "log2": F.log2,
    "sqrt": F.sqrt,
    "exponent": _exponent,
    "gamma": _lazy_udf("gamma"),
    "lgamma": _lazy_udf("lgamma"),
    "digamma": _lazy_udf("digamma"),
    "erf": _lazy_udf("erf"),
    "erfc": _lazy_udf("erfc"),
}

# binary arithmetic the reference supports (src/operators.jl:31-48)
BINARY_TABLE: dict[str, Callable[[Column, Column], Column]] = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "^": F.pow,
    "div": lambda a, b: (a / b).cast("bigint"),  # trunc toward zero
    "fld": lambda a, b: F.floor(a / b).cast("bigint"),
    "mod": lambda a, b: ((a % b) + b) % b,  # Julia mod: sign of divisor
    "rem": lambda a, b: a % b,  # Julia rem: sign of dividend (SQL %)
}


def _sql(c: Column) -> str:
    return c._jc.toString()  # noqa: SLF001


def lift(name: str, col: str | Column, *args) -> Column:
    """Apply a reference-named scalar function to a column."""
    c = F.col(col) if isinstance(col, str) else col
    if name in FUNCTION_TABLE:
        fn = FUNCTION_TABLE[name]
        return fn(c, *args) if args else fn(c)
    if name in BINARY_TABLE:
        other = args[0]
        if not isinstance(other, Column):
            other = F.lit(other)
        return BINARY_TABLE[name](c, other)
    raise KeyError(f"unknown function {name!r}")
