"""Window-function equivalents of the reference's cumulative and
lag-based vector ops (SURVEY §2.5; reference src/operators.jl:58-60).

All take an explicit ordering (and optional partitioning): Spark tables
are unordered, so "cumulative over the frame's row order" must name the
order. Partitioned windows scale (state per key, no global sort).
Whole-column (unpartitioned) cumulatives — the reference's default mode
— go through :func:`with_running`, which plans a range-repartitioned
prefix aggregate (per-partition running state + broadcast per-partition
carries) instead of the SinglePartition exchange a bare
``ORDER BY``-only window would plan; the Column-form helpers refuse
``partition_by=None`` so the single-task trap cannot be hit by
accident.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _window(order_by, partition_by=None) -> WindowSpec:
    order_by = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    if partition_by:
        partition_by = (
            [partition_by] if isinstance(partition_by, str) else list(partition_by)
        )
        return Window.partitionBy(*partition_by).orderBy(*order_by)
    return Window.orderBy(*order_by)


def _require_partition(partition_by, op: str):
    """Column-form cum*/lag helpers are window expressions and cannot
    plan the distributed prefix aggregate themselves; unpartitioned use
    would silently funnel every row through ONE task (SinglePartition
    exchange). Route whole-column cumulatives to :func:`with_running`.
    """
    if not partition_by:
        raise ValueError(
            f"{op}(..., partition_by=None) would plan a single-partition "
            "global window. For whole-column running aggregates use "
            "ops.window.with_running(df, ...), which range-partitions "
            "the ordering and combines per-partition carries instead."
        )


def _running(w: WindowSpec) -> WindowSpec:
    return w.rowsBetween(Window.unboundedPreceding, Window.currentRow)


def cumsum(col, order_by, partition_by=None) -> Column:
    """cumsum (reference src/operators.jl:60)."""
    _require_partition(partition_by, "cumsum")
    return F.sum(col).over(_running(_window(order_by, partition_by)))


def cummax(col, order_by, partition_by=None) -> Column:
    _require_partition(partition_by, "cummax")
    return F.max(col).over(_running(_window(order_by, partition_by)))


def cummin(col, order_by, partition_by=None) -> Column:
    _require_partition(partition_by, "cummin")
    return F.min(col).over(_running(_window(order_by, partition_by)))


def _cumprod_parts(c: Column, w: WindowSpec) -> tuple[Column, Column, Column]:
    """Running (log-magnitude, #negatives, #zeros) — the decomposition
    that turns a product into window-able sums. log is guarded to
    nonzero inputs so an ANSI session never sees log(0)."""
    log_mag = F.sum(F.when(c != 0, F.log(F.abs(c)))).over(w)
    n_neg = F.sum(F.when(c < 0, 1).otherwise(0)).over(w)
    n_zero = F.sum(F.when(c == 0, 1).otherwise(0)).over(w)
    return log_mag, n_neg, n_zero


def _cumprod_combine(log_mag: Column, n_neg: Column, n_zero: Column) -> Column:
    sign = F.when(n_neg % 2 == 1, -1.0).otherwise(1.0)
    return F.when(n_zero > 0, F.lit(0.0)).otherwise(sign * F.exp(log_mag))


def cumprod(col, order_by, partition_by=None) -> Column:
    """cumprod via exp∘cumsum∘log with sign tracking (no native product
    window aggregate; stays JVM-side)."""
    _require_partition(partition_by, "cumprod")
    c = F.col(col) if isinstance(col, str) else col
    w = _running(_window(order_by, partition_by))
    return _cumprod_combine(*_cumprod_parts(c, w))


def diff(col, order_by, partition_by=None) -> Column:
    """diff: col - lag(col) (reference src/operators.jl:58)."""
    _require_partition(partition_by, "diff")
    c = F.col(col) if isinstance(col, str) else col
    w = _window(order_by, partition_by)
    return c - F.lag(c).over(w)


def reldiff(col, order_by, partition_by=None) -> Column:
    """reldiff: (col - lag)/lag (reference src/operators.jl:58).
    Zero previous values yield NULL (guarded — identical to the
    non-ANSI x/0 result, but safe under an ANSI session too)."""
    _require_partition(partition_by, "reldiff")
    c = F.col(col) if isinstance(col, str) else col
    w = _window(order_by, partition_by)
    prev = F.lag(c).over(w)
    return F.when(prev != 0, (c - prev) / prev)


def percent_change(col, order_by, partition_by=None) -> Column:
    """percent_change (reference export src/DataFrames.jl:121)."""
    return reldiff(col, order_by, partition_by) * 100.0


_RUNNING_OPS = ("sum", "max", "min", "prod", "diff", "reldiff", "pct_change")
# carries inline as a literal pid->value map up to this many partitions;
# beyond it they ship as ONE broadcast-joined table (a 10k-partition
# frame would otherwise put 20k literals in every combine expression)
_CARRY_MAP_MAX = 512


def with_running(
    df: DataFrame,
    specs: dict,
    order_by,
    partition_by=None,
) -> DataFrame:
    """Running (cumulative / lag) aggregates as a DataFrame transform —
    the scale path for the reference's WHOLE-COLUMN cumulative ops
    (reference src/operators.jl:58-60, where ``cumsum(dv)`` runs over
    the frame's global row order).

    ``specs`` maps output column name -> ``(op, source_col)`` with op in
    ``sum|max|min|prod|diff|reldiff|pct_change``; all requested specs
    are computed in ONE pass. ``order_by`` must be a total ascending
    ordering (add a tie-break column, e.g. a row id).

    With ``partition_by`` this delegates to per-key windows (state per
    key, one hash shuffle). WITHOUT it, a naive ``ORDER BY``-only
    window would plan a SinglePartition exchange — every row through
    one task. Instead this plans the classic distributed prefix scan:

    1. range-repartition + local sort on ``order_by`` (parallel sampled
       shuffle, same machinery as ops.sorting.global_row_number);
    2. per-partition running aggregates over a ``__pid__`` window
       (parallel, one window state per partition);
    3. ONE tiny job collects per-partition totals/last-values
       (#partitions rows), the exclusive prefix combine is computed on
       the driver and broadcast back as a literal pid->carry map.

    Carry combine per op: sum adds the prefix total, max/min fold with
    greatest/least, prod folds the (log-magnitude, sign, zero-count)
    decomposition, and the lag family substitutes the previous
    partition's last value for each partition's first row. NULL
    semantics match the window forms exactly (aggregates skip NULLs; a
    NULL previous value yields NULL diff; reldiff guards prev==0 to
    NULL). Division is when-guarded, so ANSI sessions are safe.
    """
    bad = [v[0] for v in specs.values() if v[0] not in _RUNNING_OPS]
    if bad:
        raise ValueError(f"unknown running ops {bad}; valid: {_RUNNING_OPS}")
    ob = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    ob = [F.col(o) if isinstance(o, str) else o for o in ob]

    if partition_by:
        pb = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = Window.partitionBy(*pb).orderBy(*ob)
        wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = df
        for name, (op, src) in specs.items():
            c = F.col(src) if isinstance(src, str) else src
            if op == "sum":
                e = F.sum(c).over(wr)
            elif op == "max":
                e = F.max(c).over(wr)
            elif op == "min":
                e = F.min(c).over(wr)
            elif op == "prod":
                e = _cumprod_combine(*_cumprod_parts(c, wr))
            else:
                prev = F.lag(c).over(w)
                e = _lag_combine(op, c, prev)
            out = out.withColumn(name, e)
        return out

    # ---- distributed unpartitioned path -------------------------------
    # PERSIST is load-bearing, not a cost lever: the carry-summary
    # collect below and the caller's final action are two separate jobs,
    # and Spark's range partitioner samples boundaries with an
    # RDD-id-dependent seed (the API warns the output "may not be
    # consistent" across runs). Once partitions exceed the reservoir
    # sample, the two jobs could draw different boundaries and rows near
    # a boundary would land in different __pid__s — the driver carries
    # would then double-count or drop them silently. Materializing the
    # partitioning once (MEMORY_AND_DISK) pins a single boundary draw
    # for both jobs. The handle rides the result as unpersist_handles
    # (core.cache.hold) — dataframes_jl_spark.release(result) frees it;
    # an evicted block recomputes THE SAME plan
    # from the same shuffle output, which Spark replays deterministically
    # only within one job — hence the persist rather than relying on it.
    from pyspark import StorageLevel

    parted = (
        df.repartitionByRange(*ob)
        .sortWithinPartitions(*ob)
        .withColumn("__pid__", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w = Window.partitionBy("__pid__").orderBy(*ob)
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # One summary job: per-partition totals / last values for every spec.
    aggs = []
    for name, (op, src) in specs.items():
        c = F.col(src) if isinstance(src, str) else src
        if op == "sum":
            aggs.append(F.sum(c).alias(f"__t_{name}"))
        elif op == "max":
            aggs.append(F.max(c).alias(f"__t_{name}"))
        elif op == "min":
            aggs.append(F.min(c).alias(f"__t_{name}"))
        elif op == "prod":
            aggs += [
                F.sum(F.when(c != 0, F.log(F.abs(c)))).alias(f"__tl_{name}"),
                F.sum(F.when(c < 0, 1).otherwise(0)).alias(f"__tn_{name}"),
                F.sum(F.when(c == 0, 1).otherwise(0)).alias(f"__tz_{name}"),
            ]
        else:
            # Last row's value by ordering; struct-wrap so a NULL value
            # is carried (max_by skips NULL values, structs are not NULL).
            aggs.append(
                F.max_by(F.struct(c.alias("v")), F.struct(*ob)).alias(f"__t_{name}")
            )
    summary_df = parted.groupBy("__pid__").agg(*aggs)
    summary = sorted(summary_df.collect(), key=lambda r: r["__pid__"])

    # Exclusive prefix combine per spec, computed on the driver over the
    # tiny (#partitions-row) summary. Each carry is a pid -> value
    # series; how it reaches the executors depends on partition count:
    # a literal map inlines join-free for typical counts, but at many
    # thousands of partitions a 2N-literal expression bloats the plan,
    # so the carries switch to ONE broadcast-joined table instead.
    carry_series: dict[str, list] = {}
    carry_types: dict[str, object] = {}
    stypes = {f.name: f.dataType for f in summary_df.schema.fields}

    def _scan(colkey: str, tname: str, fold, dtype) -> None:
        acc, series = None, []
        for r in summary:
            series.append(acc)
            t = r[tname] if not tname.endswith(".v") else r[tname[:-2]]["v"]
            if tname.endswith(".v"):
                acc = t  # lag carry: last value, NULL included
            elif t is not None:
                acc = t if acc is None else fold(acc, t)
        carry_series[colkey] = series
        carry_types[colkey] = dtype

    for name, (op, src) in specs.items():
        if op in ("sum", "max", "min"):
            fold = {
                "sum": lambda a, b: a + b,
                "max": _nan_max,
                "min": _nan_min,
            }[op]
            _scan(f"__c_{name}", f"__t_{name}", fold, stypes[f"__t_{name}"])
        elif op == "prod":
            _scan(f"__cl_{name}", f"__tl_{name}", lambda a, b: a + b,
                  stypes[f"__tl_{name}"])
            _scan(f"__cn_{name}", f"__tn_{name}", lambda a, b: a + b,
                  stypes[f"__tn_{name}"])
            _scan(f"__cz_{name}", f"__tz_{name}", lambda a, b: a + b,
                  stypes[f"__tz_{name}"])
        else:
            _scan(f"__c_{name}", f"__t_{name}.v", None,
                  stypes[f"__t_{name}"]["v"].dataType)

    big = len(summary) > _CARRY_MAP_MAX
    if big:
        from pyspark.sql.types import StructField, StructType

        fields = [StructField("__pid__", stypes["__pid__"])]
        fields += [StructField(k, carry_types[k]) for k in carry_series]
        rows = [
            tuple([summary[i]["__pid__"]] + [carry_series[k][i] for k in carry_series])
            for i in range(len(summary))
        ]
        cdf = parted.sparkSession.createDataFrame(rows, StructType(fields))
        out = parted.join(F.broadcast(cdf), on="__pid__", how="left")
    else:
        out = parted

    def _carry(colkey: str):
        """Carry expression for one series, or None if the whole series
        is empty (NULL carry everywhere)."""
        series = carry_series[colkey]
        if all(v is None for v in series):
            return None
        if big:
            return F.col(colkey)
        items = [
            (summary[i]["__pid__"], v) for i, v in enumerate(series) if v is not None
        ]
        m = F.create_map(*[F.lit(x) for pv in items for x in pv])
        return m[F.col("__pid__")]

    for name, (op, src) in specs.items():
        c = F.col(src) if isinstance(src, str) else src
        if op in ("sum", "max", "min"):
            carry = _carry(f"__c_{name}")
            local = {"sum": F.sum, "max": F.max, "min": F.min}[op](c).over(wr)
            if carry is None:
                e = local
            elif op == "sum":
                e = F.coalesce(local + carry, local, carry)
            else:
                e = (F.greatest if op == "max" else F.least)(local, carry)
        elif op == "prod":
            local_l, local_n, local_z = _cumprod_parts(c, wr)
            cl, cn, cz = (
                _carry(f"__cl_{name}"),
                _carry(f"__cn_{name}"),
                _carry(f"__cz_{name}"),
            )
            log_mag = (
                local_l if cl is None else F.coalesce(local_l + cl, local_l, cl)
            )
            n_neg = local_n if cn is None else local_n + F.coalesce(cn, F.lit(0))
            n_zero = local_z if cz is None else local_z + F.coalesce(cz, F.lit(0))
            e = _cumprod_combine(log_mag, n_neg, n_zero)
        else:  # diff / reldiff / pct_change
            carry = _carry(f"__c_{name}")
            prev = F.lag(c).over(w)
            if carry is not None:
                prev = F.when(F.row_number().over(w) == 1, carry).otherwise(prev)
            e = _lag_combine(op, c, prev)
        out = out.withColumn(name, e)
    drop = ["__pid__"] + (list(carry_series) if big else [])
    from ..core.cache import hold

    return hold(out.drop(*drop), parted, df)  # df: upstream handles


def _nan_max(a, b):
    """Driver-side fold matching Spark's greatest(): NaN orders LARGER
    than every double, so any NaN operand wins the max. Python's bare
    max() is order-dependent on NaN and would disagree with the
    executor-side combine."""
    if isinstance(a, float) and a != a:
        return a
    if isinstance(b, float) and b != b:
        return b
    return max(a, b)


def _nan_min(a, b):
    """least() counterpart: NaN orders larger, so min skips it."""
    if isinstance(a, float) and a != a:
        return b
    if isinstance(b, float) and b != b:
        return a
    return min(a, b)


def _lag_combine(op: str, c: Column, prev: Column) -> Column:
    if op == "diff":
        return c - prev
    rel = F.when(prev != 0, (c - prev) / prev)
    return rel if op == "reldiff" else rel * 100.0


def rolling_window(
    order_by,
    preceding: int,
    following: int = 0,
    partition_by=None,
) -> WindowSpec:
    """RANGE-frame window over a NUMERIC ordering expression (e.g.
    microsecond epoch): frame = rows whose key lies in
    ``[current - preceding, current + following]``, boundary-inclusive,
    ties (peers) always included — the time-series rolling frame.

    Partitioned use scales: Spark keeps one sliding aggregate state per
    partition key inside the window exec, so cost is O(rows) after the
    partition shuffle — no per-frame rescan. An unpartitioned rolling
    window plans a SinglePartition sort; require an explicit opt-in by
    passing partition_by=None knowingly (documented, as with the other
    positional ops).
    """
    w = _window(order_by, partition_by)
    return w.rangeBetween(-int(preceding), int(following))


def rolling_stats(
    df: DataFrame,
    value_col: str,
    time_col: str,
    partition_by,
    width_seconds: int,
    scale: int = 4,
) -> DataFrame:
    """Rolling count/sum/mean/std/min/max of ``value_col`` over a
    trailing ``width_seconds`` event-time window per partition key.

    Determinism contract: sum and sum-of-squares are accumulated as
    QUANTIZED int64 (floor(x*10^scale+0.5)) so window-accumulation
    order cannot move the low bits; mean/std are then derived with one
    fixed double-arithmetic shape that an oracle engine can replicate
    op-for-op. |x|*10^scale and the frame totals must fit int64 —
    callers with larger magnitudes lower ``scale``.
    """
    m = float(10**scale)
    key = F.unix_micros(F.col(time_col))
    w = rolling_window(key, width_seconds * 1_000_000, 0, partition_by)
    q = F.floor(F.col(value_col) * F.lit(m) + F.lit(0.5)).cast("long")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(q).over(w)
    sq = F.sum(q * q).over(w)
    mean = s.cast("double") / n / F.lit(m)
    # var = (sum(x^2) - sum(x)^2/n) / (n-1), in original units
    var = (
        sq.cast("double") / F.lit(m * m)
        - (s.cast("double") / F.lit(m)) * (s.cast("double") / F.lit(m)) / n
    ) / (n - F.lit(1))
    return df.select(
        *[c for c in df.columns],
        n.alias("roll_n"),
        (s.cast("double") / F.lit(m)).alias("roll_sum"),
        F.round(mean, 6).alias("roll_mean"),
        F.when(n > 1, F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6)).alias(
            "roll_std"
        ),
        F.min(value_col).over(w).alias("roll_min"),
        F.max(value_col).over(w).alias("roll_max"),
    )


def ewma(
    df: DataFrame,
    value_col: str,
    time_col: str,
    partition_by: str,
    alpha: float,
    tiebreak: Sequence[str] = (),
    max_group_rows: int = 5_000_000,
) -> DataFrame:
    """Exponentially-weighted moving average of ``value_col`` per
    partition key in ``time_col`` order (pandas ``ewm(adjust=True)``
    semantics: y_i = sum_j (1-alpha)^(i-j) x_j / sum_j (1-alpha)^(i-j)).

    EWMA is a per-row recursion — not expressible with Spark's window
    frames without an overflow-prone (1-alpha)^(-j) rescaling — so this
    is the documented Pandas-UDF path: groups ship as Arrow batches,
    each computed by pandas' C kernel. ``applyInPandas`` materializes
    one GROUP per pandas frame, so the partition key must be
    fine-grained (a user/session/entity id, never a constant);
    ``max_group_rows`` fails loudly before an executor OOMs silently.

    The batch cross-check for this operator is q_ewma: the final EWMA
    per key must match the closed-form weighted sum computed
    independently (by the DuckDB oracle and by hand) to 6 decimals.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from pyspark.sql.types import DoubleType, StructField, StructType

    # StructType.add mutates in place — never call it on df.schema
    schema = StructType(
        list(df.schema.fields) + [StructField("ewma", DoubleType())]
    )
    sort_cols = [time_col, *tiebreak]

    def _fn(pdf):
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"ewma group exceeds max_group_rows={max_group_rows} "
                f"({len(pdf)} rows): partition key too coarse for the "
                "per-group pandas path"
            )
        pdf = pdf.sort_values(sort_cols)
        pdf["ewma"] = pdf[value_col].ewm(alpha=alpha, adjust=True).mean()
        return pdf

    return df.groupBy(partition_by).applyInPandas(_fn, schema)
