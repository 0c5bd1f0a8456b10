"""R-style model formulas → design matrices (reference src/formula.jl).

``Formula("y ~ a + b + a&b")`` parses the reference's operators
(reference parsing src/formula.jl:14-37):

- ``+`` main effects; ``&`` interaction; ``*`` main + interaction
  expansion (``a*b`` → ``a + b + a&b``, reference src/formula.jl:67-82);
- intercept on by default, ``0 +`` / ``- 1`` removes it (reference
  intercept handling src/formula.jl:131-148).

``ModelFrame`` drops incomplete rows (NA-omit, reference
src/formula.jl:152-177). ``ModelMatrix`` expands string/categorical
columns to treatment-contrast dummies — first level (sorted) is the
base, mirroring ``contr_treatment`` (reference src/formula.jl:185-196) —
and interaction columns as products (``expandcols``, reference
src/formula.jl:205-215). All expansion is withColumn arithmetic: the
design matrix is a DataFrame of plain double columns, distributable
like any other; levels are collected once per categorical column
(small — cardinality-bounded) and inlined as literals.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# hard ceiling on distinct levels collected to the driver for contrast
# coding; beyond this, exact treatment contrasts are the wrong tool
MAX_FACTOR_LEVELS = 10_000


@dataclass
class Formula:
    """Parsed formula: response ~ terms (reference Formula/Terms
    src/formula.jl:14-37)."""

    lhs: str
    rhs_terms: list[tuple[str, ...]]  # each term = tuple of interacting vars
    intercept: bool = True
    raw: str = ""

    @classmethod
    def parse(cls, s: str) -> "Formula":
        if "~" not in s:
            raise ValueError(f"formula needs '~': {s!r}")
        lhs, rhs = (part.strip() for part in s.split("~", 1))
        intercept = True
        terms: list[tuple[str, ...]] = []
        for raw_piece in (p.strip() for p in re.split(r"\+", rhs)):
            # handle '- 1' removals attached to a term ("a - 1") or alone
            sub = [s.strip() for s in raw_piece.split("-")]
            piece = sub[0]
            for removal in sub[1:]:
                if removal == "1":
                    intercept = False
                else:
                    raise ValueError(f"unsupported removal term: {removal!r}")
            if piece in ("", "1"):
                continue
            if piece == "0":
                intercept = False
                continue
            if "*" in piece:
                vars_ = tuple(v.strip() for v in piece.split("*"))
                # a*b → a + b + a&b (reference src/formula.jl:67-82)
                for v in vars_:
                    if (v,) not in terms:
                        terms.append((v,))
                terms.append(vars_)
            elif "&" in piece:
                terms.append(tuple(v.strip() for v in piece.split("&")))
            else:
                terms.append((piece,))
        return cls(lhs=lhs, rhs_terms=terms, intercept=intercept, raw=s)

    def variables(self) -> list[str]:
        seen: list[str] = []
        for t in self.rhs_terms:
            for v in t:
                if v not in seen:
                    seen.append(v)
        return seen


@dataclass
class ModelFrame:
    """NA-omitted frame restricted to formula variables (reference
    src/formula.jl:152-177)."""

    formula: Formula
    df: DataFrame

    @classmethod
    def build(cls, formula: str | Formula, df: DataFrame) -> "ModelFrame":
        f = Formula.parse(formula) if isinstance(formula, str) else formula
        cols = [f.lhs, *f.variables()]
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise KeyError(f"formula variables not in frame: {missing}")
        return cls(f, df.select(*cols).dropna())


@dataclass
class ModelMatrix:
    """Design matrix as a DataFrame + coefficient names (reference
    ModelMatrix src/formula.jl:205-237, coefnames :239-256)."""

    df: DataFrame
    coefnames: list[str] = field(default_factory=list)
    response: str = ""

    @classmethod
    def build(cls, mf: ModelFrame) -> "ModelMatrix":
        f = mf.formula
        src = mf.df
        dtypes = dict(src.dtypes)

        # per-variable encoded columns: numeric → itself; categorical →
        # treatment-contrast dummies over sorted levels minus the first
        encodings: dict[str, list[tuple[str, Column]]] = {}
        for v in f.variables():
            if dtypes[v] == "string" or dtypes[v] == "boolean":
                # bounded driver collect: a high-cardinality factor would
                # OOM the driver and produce a uselessly wide matrix —
                # fail loudly instead (cap mirrors practical contrast
                # coding; use hashing/target encoding beyond it)
                cap = MAX_FACTOR_LEVELS
                rows = (
                    src.select(v).distinct().orderBy(v).limit(cap + 1).collect()
                )
                if len(rows) > cap:
                    raise ValueError(
                        f"factor {v!r} has more than {cap} distinct levels; "
                        "refusing to build contrasts (would OOM the driver). "
                        "Bucket/hash the column or raise MAX_FACTOR_LEVELS."
                    )
                levels = [r[v] for r in rows if r[v] is not None]
                encodings[v] = [
                    (
                        f"{v}:{lvl}",
                        F.when(F.col(v) == F.lit(lvl), 1.0).otherwise(0.0),
                    )
                    for lvl in levels[1:]  # drop base level (treatment coding)
                ]
            else:
                encodings[v] = [(v, F.col(v).cast("double"))]

        out_cols: list[Column] = []
        names: list[str] = []
        if f.intercept:
            out_cols.append(F.lit(1.0).alias("(Intercept)"))
            names.append("(Intercept)")
        for term in f.rhs_terms:
            # cross products of the per-variable encodings
            # (expandcols, reference src/formula.jl:205-215)
            combos: list[tuple[str, Column]] = [("", F.lit(1.0))]
            for v in term:
                combos = [
                    (
                        f"{nm}&{cn}" if nm else cn,
                        expr * ce,
                    )
                    for nm, expr in combos
                    for cn, ce in encodings[v]
                ]
            for nm, expr in combos:
                if nm in names:
                    continue
                names.append(nm)
                out_cols.append(expr.alias(nm))

        resp = F.col(f.lhs).cast("double").alias(f.lhs)
        return cls(
            df=src.select(resp, *out_cols), coefnames=names, response=f.lhs
        )


def model_response(mf: ModelFrame) -> DataFrame:
    """model_response (reference src/formula.jl:180-183)."""
    return mf.df.select(F.col(mf.formula.lhs).cast("double").alias(mf.formula.lhs))


def model_matrix(formula: str, df: DataFrame) -> ModelMatrix:
    """One-shot convenience: formula string → ModelMatrix."""
    return ModelMatrix.build(ModelFrame.build(formula, df))
