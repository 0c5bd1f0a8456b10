"""CSV ingest/egress with the reference's ``readtable`` option surface
(reference ParseOptions src/io.jl:11-31, readtable src/io.jl:596-655).

The parser itself is Spark's distributed univocity CSV reader — the
reference's byte state machine (readnrows! src/io.jl:135-263) and type
inference cascade (builddf src/io.jl:395-488) map to ``inferSchema`` and
reader options. Options Spark lacks natively (multiple NA strings,
custom true/false string sets) are applied as a vectorized post-cast
pass, still JVM-side.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.index import clean_colname, make_unique


def getseparator(filename: str) -> str:
    """Separator by extension: .csv→',' .tsv→tab .wsv→space (reference
    getseparator src/io.jl:121-131). Transparent .gz honored."""
    base = filename[:-3] if filename.endswith(".gz") else filename
    ext = os.path.splitext(base)[1].lower()
    return {".csv": ",", ".tsv": "\t", ".wsv": " "}.get(ext, ",")


def readtable(
    spark: SparkSession,
    path: str,
    header: bool = True,
    separator: str | None = None,
    quotemark: str = '"',
    decimal: str = ".",
    nastrings: Sequence[str] = ("", "NA"),
    truestrings: Sequence[str] = ("T", "t", "TRUE", "true"),
    falsestrings: Sequence[str] = ("F", "f", "FALSE", "false"),
    makefactors: bool = False,  # noqa: ARG001 - factor ≡ string col in Spark
    nrows: int = -1,
    colnames: Sequence[str] | None = None,
    cleannames: bool = False,
    allowcomments: bool = False,
    commentmark: str = "#",
    ignorepadding: bool = True,
    skipstart: int = 0,
    skipblanks: bool = True,
    encoding: str = "utf8",
    allowescapes: bool = False,
    infer_schema: bool = True,
    schema: str | None = None,
    linesep: str | None = None,
    allowquotednewlines: bool = False,
    gzparallel: int | None = None,
) -> DataFrame:
    """readtable(path; kwargs...) (reference src/io.jl:596-655).

    Distributed from the first byte: Spark splits the file into input
    partitions; the reference's ``dreadtable`` block-split
    (src/dataframe_blocks.jl:126-152) is this reader's default behavior.
    ``.gz`` decompresses transparently (reference src/io.jl:622-626),
    at the cost of a single-partition scan; pass ``gzparallel=N`` to
    decompress once and fan the PARSE out over N partitions via
    from_csv (the decompress stays sequential — gzip is not
    splittable — but parsing, the dominant cost, parallelizes).
    """
    if separator is None:
        separator = getseparator(path)
    enc = {"utf8": "UTF-8", "latin1": "ISO-8859-1"}.get(encoding.lower(), encoding)

    reader = spark.read
    if schema is not None:
        # declared schema (reference DataFrame(column_types, …) ingest,
        # src/dataframe.jl:168-181): skips the inference sampling pass
        reader = reader.schema(schema)
        infer_schema = False
    reader = (
        reader.option("header", header)
        .option("sep", separator)
        .option("quote", quotemark)
        .option("inferSchema", infer_schema)
        .option("ignoreLeadingWhiteSpace", ignorepadding)
        .option("ignoreTrailingWhiteSpace", ignorepadding)
        .option("encoding", enc)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    # first NA string is the reader-level null marker; the rest post-cast
    if nastrings:
        reader = reader.option("nullValue", nastrings[0])
    if skipblanks:
        reader = reader.option("ignoreEmptyLines", "true")
    if linesep is not None:
        # classic-Mac '\r'-only files (reference newlines corpus,
        # test/data/newlines/os9.csv): the default reader recognizes only
        # \n and \r\n record ends
        reader = reader.option("lineSep", linesep)
    if allowquotednewlines:
        # record separators inside quoted fields (reference embedded_*
        # newlines corpus). multiLine makes each FILE one split — a
        # deliberate trade: correctness for embedded newlines vs scan
        # parallelism, so it's opt-in, not default.
        reader = reader.option("multiLine", "true")
    if allowcomments:
        reader = reader.option("comment", commentmark)
    if allowescapes:
        reader = reader.option("escape", "\\")
    if decimal != ".":
        # Spark's csv reader has no decimal-mark option: read affected
        # columns as strings and post-convert (locale CSV parity).
        reader = reader.option("inferSchema", False)
    if gzparallel and path.endswith(".gz") and not allowquotednewlines:
        # Parallel parse of a non-splittable gzip stream (reference
        # dreadtable block-splits only PLAIN files,
        # src/dataframe_blocks.jl:126-152; Spark likewise reads .gz as
        # one partition). Decompression is inherently sequential, but
        # parsing dominates it: read raw LINES once (single-partition
        # decompress), shuffle them across ``gzparallel`` partitions,
        # and parse with from_csv — all JVM-side, never an rdd.map
        # through Python workers. Schema comes from ``schema`` or a
        # driver-side inference over a bounded 1000-line prefix.
        # UTF-8 only; honors skipstart/header/comments/blank-skip.
        text = spark.read.text(path).withColumn(
            "__mono__", F.monotonically_increasing_id()
        )
        drop = skipstart + (1 if header else 0)
        body = text.filter(F.col("__mono__") >= drop)
        if allowcomments:
            body = body.filter(~F.col("value").startswith(commentmark))
        if skipblanks:
            # the line-level parse would turn blank lines into all-null
            # rows; the csv reader drops them
            body = body.filter(F.trim(F.col("value")) != "")
        if schema is not None:
            ddl = schema
        else:
            prefix = [
                r["value"]
                for r in text.orderBy("__mono__").limit(drop + 1000).collect()
            ][skipstart:]
            sample = reader.csv(spark.sparkContext.parallelize(prefix or [""]))
            ddl = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in sample.schema.fields
            )
        opts = {
            "sep": separator,
            "quote": quotemark,
            "ignoreLeadingWhiteSpace": str(ignorepadding).lower(),
            "ignoreTrailingWhiteSpace": str(ignorepadding).lower(),
            "mode": "PERMISSIVE",
        }
        if nastrings:
            opts["nullValue"] = nastrings[0]
        if allowescapes:
            opts["escape"] = "\\"
        df = (
            body.repartition(gzparallel)
            .select(F.from_csv(F.col("value"), ddl, opts).alias("__r__"))
            .select("__r__.*")
        )
    elif skipstart:
        # skip-N-preamble-lines (reference ParseOptions skipstart,
        # src/io.jl:11-31): read raw text lines, rank them with the
        # distributed global_row_number (monotonically_increasing_id
        # follows file order: partitions of a file are ordered by byte
        # range), drop the first N, re-parse the remainder as CSV. One
        # extra pass over the text — only paid when skipstart is used.
        from ..ops.sorting import global_row_number

        text = spark.read.text(path).withColumn(
            "__mono__", F.monotonically_increasing_id()
        )
        kept = (
            global_row_number(text, cols=["__mono__"], col_name="__line__")
            .filter(F.col("__line__") > skipstart)
            .orderBy("__line__")
            .select("value")
        )
        df = reader.csv(kept.rdd.map(lambda r: r[0]))
    else:
        df = reader.csv(path)

    if colnames is not None:
        df = df.toDF(*make_unique(list(colnames)))
    elif not header:
        # reference gennames: x1..xn (src/utils.jl:70-72)
        df = df.toDF(*[f"x{i}" for i in range(1, len(df.columns) + 1)])
    if cleannames:
        df = df.toDF(*make_unique([clean_colname(c) for c in df.columns]))

    # post-cast passes (vectorized, JVM-side)
    extra_na = [s for s in nastrings[1:] if s != nastrings[0]]
    if extra_na:
        for c, t in df.dtypes:
            if t == "string":
                df = df.withColumn(
                    c, F.when(F.col(c).isin(extra_na), None).otherwise(F.col(c))
                )
    ts, fs = set(truestrings), set(falsestrings)
    if ts != {"T", "t", "TRUE", "true"} or fs != {"F", "f", "FALSE", "false"}:
        # A column becomes boolean only if EVERY non-null value is a
        # declared true/false token (one probe agg, like the decimal
        # cascade below). The old per-value CASE silently widened the
        # branches back to string, so matched values became the literal
        # strings 'true'/'false' and the column never turned boolean.
        str_cols = [c for c, t in df.dtypes if t == "string"]
        if str_cols:
            tokens = list(ts | fs)
            probe = df.agg(
                *[
                    F.sum(
                        F.when(
                            F.col(c).isNotNull() & ~F.col(c).isin(tokens), 1
                        ).otherwise(0)
                    ).alias(f"{c}__bad")
                    for c in str_cols
                ],
                *[
                    F.sum(
                        F.when(F.col(c).isNotNull(), 1).otherwise(0)
                    ).alias(f"{c}__nn")
                    for c in str_cols
                ],
            ).collect()[0]
            for c in str_cols:
                if probe[f"{c}__bad"] == 0 and probe[f"{c}__nn"] > 0:
                    df = df.withColumn(
                        c,
                        F.when(F.col(c).isin(list(ts)), F.lit(True)).when(
                            F.col(c).isin(list(fs)), F.lit(False)
                        ),
                    )
    if decimal != ".":
        # per-column inference decision like the reference's cascade: a
        # column becomes double only if EVERY non-null value parses after
        # decimal-mark replacement (one extra aggregate scan, documented)
        str_cols = [c for c, t in df.dtypes if t == "string"]
        if str_cols:
            probes = df.agg(
                *[
                    F.sum(
                        F.when(
                            F.col(c).isNotNull()
                            & F.replace(F.col(c), F.lit(decimal), F.lit("."))
                            .cast("double")
                            .isNull(),
                            1,
                        ).otherwise(0)
                    ).alias(c)
                    for c in str_cols
                ]
            ).collect()[0]
            for c in str_cols:
                if probes[c] == 0:
                    df = df.withColumn(
                        c,
                        F.replace(F.col(c), F.lit(decimal), F.lit(".")).cast(
                            "double"
                        ),
                    )

    if nrows and nrows > 0:
        df = df.limit(nrows)
    return df


def writetable(
    df: DataFrame,
    path: str,
    separator: str | None = None,
    quotemark: str = '"',
    header: bool = True,
    single_file: bool = False,
) -> None:
    """writetable (reference src/io.jl:726-791). Part files are the
    native distributed layout (reference dwritetable
    src/dataframe_blocks.jl:590-625); ``single_file`` coalesces to one
    partition — driver-side bottleneck, small data only."""
    if separator is None:
        separator = getseparator(path)
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", header)
        .option("sep", separator)
        .option("quote", quotemark)
        .csv(path)
    )


def read_rda(spark, path: str):
    """R .rda/.RData reader (reference src/RDA.jl): pure-Python XDR
    decode, no optional dependencies. See :mod:`.rda`."""
    from .rda import read_rda as _read_rda

    return _read_rda(spark, path)
