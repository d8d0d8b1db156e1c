"""Sources: parquet test tables and the reference's CSV scan shape.

The reference loads one CSV with an inline column list, ``'?'`` as the null
sentinel and a ``', '`` separator (reference ``naive-suppresion.py:13-14``,
``t-closeness.py:15-16``). Spark equivalents are implemented here as P1 of
SURVEY §2a. The driver's synthetic tables are parquet (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# The reference's inline Adult schema (naive-suppresion.py:7-11): 6 int64
# columns, the rest strings. Declared explicitly so the reader never has to
# infer (an extra full scan at 100 TB).
ADULT_COLUMNS: list[tuple[str, T.DataType]] = [
    ("age", T.LongType()),
    ("workclass", T.StringType()),
    ("fnlwgt", T.LongType()),
    ("education", T.StringType()),
    ("education-num", T.LongType()),
    ("marital-status", T.StringType()),
    ("occupation", T.StringType()),
    ("relationship", T.StringType()),
    ("race", T.StringType()),
    ("sex", T.StringType()),
    ("capital-gain", T.LongType()),
    ("capital-loss", T.LongType()),
    ("hours-per-week", T.LongType()),
    ("native-country", T.StringType()),
    ("income", T.StringType()),
]

ADULT_SCHEMA = T.StructType([T.StructField(n, t, True) for n, t in ADULT_COLUMNS])


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic parquet table. Parquet scan → Catalyst gets column
    pruning + predicate pushdown + min/max row-group skipping for free.

    ``events.ts`` has shipped in two encodings: TIMESTAMP(NANOS) stored as
    int64 (unreadable by Spark without ``spark.sql.legacy.parquet.
    nanosAsLong``, under which it arrives as long nanoseconds) and native
    TIMESTAMP(MICROS). Both are handled: the conf is runtime-settable and
    set here (not at session-build time, so externally-constructed
    SparkSessions need no special configuration), and the long flavor is
    converted to a proper TimestampType (lossless — no sub-microsecond
    values in this data).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def with_parsed_props(
    df: DataFrame, props_col: str = "props", schema: str = "k BIGINT"
) -> DataFrame:
    """Typed extraction for a semi-structured JSON column (``events.props``):
    ONE ``from_json`` parse per row into a typed struct (JVM-side Jackson)
    rather than a ``get_json_object`` JsonPath walk per accessed field —
    at 100 TB the parse happens once however many fields downstream
    expressions read. Adds ``<props_col>_parsed``."""
    from pyspark.sql import functions as F

    return df.withColumn(f"{props_col}_parsed", F.from_json(F.col(props_col), schema))


DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    drop_corrupt: bool = True,
) -> DataFrame:
    """Read a JSON-Lines document corpus — the interchange format most
    LLM training-data pipelines ship (one JSON object per line, splittable
    by newline so a 100 TB directory scans with full partition
    parallelism, unlike multi-line JSON arrays).

    The schema is DECLARED, never inferred: schema inference is a full
    extra pass over the data (fatal at scale) and silently widens types on
    dirty corpora. Corrupt lines go to Spark's PERMISSIVE
    ``_corrupt_record`` column; ``drop_corrupt=True`` (default) filters
    them out so one mangled line cannot poison a batch — set False to
    route them to a quarantine sink instead.
    """
    base = schema or DOCUMENTS_JSONL_SCHEMA
    with_corrupt = T.StructType(
        base.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    if drop_corrupt:
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return df


def write_documents_jsonl(df: DataFrame, path: str, mode: str = "error") -> None:
    """Write a corpus as JSON-Lines (one object per line, text/json codec
    chosen by extension) — the inverse of :func:`read_documents_jsonl`."""
    df.write.mode(mode).json(path)


def read_adult_csv(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """P1 — CSV scan with inline schema and '?' null sentinel.

    Mirrors ``pd.read_csv(url, names=columns, sep=', ', na_values='?')``
    (reference ``naive-suppresion.py:13-14``): explicit schema (no inference
    pass), ``'?'`` → NULL, leading whitespace stripped (the Adult file is
    comma+space separated).
    """
    return (
        spark.read.schema(schema or ADULT_SCHEMA)
        .option("nullValue", "?")
        .option("ignoreLeadingWhiteSpace", "true")
        .option("ignoreTrailingWhiteSpace", "true")
        .csv(path)
    )
