"""Text normalization — the engine's sanctioned vectorized-UDF surface.

The reference strips whitespace on all string columns and maps empty strings
to NULL in-process with pandas (``/root/reference/src/etl_pipeline.py:339-342``,
``/root/reference/src/data_validator.py:338-345``). Per the north star this
must be vectorized Arrow/pandas — no per-row Python.

Two interchangeable implementations (identical semantics, asserted by tests):

* ``normalize_text_expr`` — pure Catalyst expressions (trim + ''->NULL +
  whitespace collapse). Stays inside whole-stage codegen; this is the hot
  path used by the CDC apply.
* ``normalize_text`` — an Arrow-batched ``pandas_udf`` doing the same via
  pandas vectorized string ops, demonstrating the UDF surface for
  normalizations Catalyst cannot express (e.g. future unicode NFC).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def normalize_text_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.trim(c), r"\s+", " ")
    return F.when(cleaned == "", F.lit(None).cast("string")).otherwise(cleaned)


# NB: a DataType instance, not a DDL string — string return types are parsed
# eagerly and would require a live SparkContext at import time.
@pandas_udf(StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    out = s.str.strip().str.replace(r"\s+", " ", regex=True)
    return out.mask(out == "", None)
