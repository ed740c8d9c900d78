"""Scans / sources (SURVEY.md §2.1 S1-S2, S5).

Reference behavior: ``readr::read_csv`` with type inference
(``BigDataProject.R:41``) and base ``read.csv`` (``clustering.R:15``,
``associationRules.R:19``). Spark-first design: Parquet is the primary
format (columnar, predicate pushdown, column pruning); CSV kept for parity
with the reference, with an explicit StructType for the canonical CarPrice
schema so production scans never pay inference (inference = an extra full
pass over 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Driver test corpus (TESTDATA.md): TPC-H-ish star schema + extension tables.
TESTDATA_TABLES = [
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
]

# Canonical CarPrice input schema — 26 columns, profiled in FIXTURES.md §1
# (reference consumption site: BigDataProject.R:41).
CARPRICE_SCHEMA = T.StructType(
    [
        T.StructField("car_ID", T.IntegerType()),
        T.StructField("symboling", T.IntegerType()),
        T.StructField("CarName", T.StringType()),
        T.StructField("fueltype", T.StringType()),
        T.StructField("aspiration", T.StringType()),
        T.StructField("doornumber", T.StringType()),
        T.StructField("carbody", T.StringType()),
        T.StructField("drivewheel", T.StringType()),
        T.StructField("enginelocation", T.StringType()),
        T.StructField("wheelbase", T.DoubleType()),
        T.StructField("carlength", T.DoubleType()),
        T.StructField("carwidth", T.DoubleType()),
        T.StructField("carheight", T.DoubleType()),
        T.StructField("curbweight", T.IntegerType()),
        T.StructField("enginetype", T.StringType()),
        T.StructField("cylindernumber", T.StringType()),
        T.StructField("enginesize", T.IntegerType()),
        T.StructField("fuelsystem", T.StringType()),
        T.StructField("boreratio", T.DoubleType()),
        T.StructField("stroke", T.DoubleType()),
        T.StructField("compressionratio", T.DoubleType()),
        T.StructField("horsepower", T.DoubleType()),
        T.StructField("peakrpm", T.DoubleType()),
        T.StructField("citympg", T.DoubleType()),
        T.StructField("highwaympg", T.DoubleType()),
        T.StructField("price", T.DoubleType()),
    ]
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Primary scan (S1 analogue at scale): vectorized columnar reader with
    row-group predicate pushdown and column pruning handled by Catalyst."""
    return spark.read.parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table, e.g. load_table(spark, sf, 'lineitem').

    ``events.ts`` is Parquet TIMESTAMP(NANOS) — a type Spark lacks. We read
    it as long (``nanosAsLong``) and truncate to microseconds with integer
    division (``div``, not ``/`` — nanos since 2024 exceed 2^53, float
    division would lose precision), matching DuckDB's nanos→micros floor.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """CSV scan (S1/S2). Explicit schema preferred; inference is a debug
    convenience only (extra full pass — never in the 100 TB path)."""
    # readr::read_csv trims cell whitespace by default (trim_ws=TRUE) —
    # the reference relies on this ("isuzu D-Max " in the raw file).
    reader = (
        spark.read.option("header", True)
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan. Explicit schema strongly preferred: schemaless
    JSON costs a full inference pass AND parses every field of every
    record; with a schema, Spark's Jackson parser projects only the
    requested fields (the closest JSON gets to column pruning)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan: same columnar pushdown/pruning properties as parquet
    (vectorized reader, min/max stripe skipping)."""
    return spark.read.orc(path)


def read_carprice_csv(spark: SparkSession, path: str) -> DataFrame:
    """Typed scan of the canonical CarPrice CSV (S1, BigDataProject.R:41)."""
    return read_csv(spark, path, schema=CARPRICE_SCHEMA)


def profile(df: DataFrame) -> DataFrame:
    """S5 schema/profile inspect: ``glimpse``/``summary`` analogue
    (BigDataProject.R:44-46) — count/mean/stddev/min/quartiles/max."""
    return df.summary()


def load_model_table(spark: SparkSession, path: str) -> DataFrame:
    """S4 model source, table form (readRDS analogue,
    BigDataProject.R:571): loads a parameter table persisted by
    :func:`..sources.writers.save_model_table`. Schema rides the
    parquet footer — no inference pass, bit-exact doubles."""
    return spark.read.parquet(path)
