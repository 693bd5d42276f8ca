"""CSV source/sink parity (SURVEY.md S10/S11).

The reference round-trips fixtures and results through CSV
(``/root/reference/src/sample_data_generator.py:291-334``,
``/root/reference/src/sql_query_executor.py:533-540``). Here CSV is a
schema-enforced edge format only — never the internal representation
(Parquet/LakeTable is): explicit schema (no inference scan), explicit
timestamp format, header on, so a CSV-delivered change log is readable by
the same ingest path as Parquet (``CdcStreamIngestor(source_format="csv")``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TS_FMT = "yyyy-MM-dd HH:mm:ss"

_OPTS = {
    "header": "true",
    "timestampFormat": TS_FMT,
    "nullValue": "\\N",  # distinguish NULL from empty string
    # full string fidelity: quote everything on write so ""/whitespace
    # survive, and disable the reader's default whitespace trimming
    "quoteAll": "true",
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-enforced CSV read (no inference pass over the data)."""
    reader = spark.read.schema(schema)
    for k, v in _OPTS.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    writer = df.write.mode(mode)
    for k, v in _OPTS.items():
        writer = writer.option(k, v)
    writer.csv(path)
