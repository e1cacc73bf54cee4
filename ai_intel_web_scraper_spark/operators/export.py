"""Export-boundary metadata sanitize (SURVEY V10).

The reference flattens chunk metadata to scalar-only values because
ChromaDB metadata must be str/int/float/bool (reference
vectorstore/store.py:335-381: lists -> comma-joined strings, dates ->
str(), None -> ""). Inside this engine we keep real ArrayType/DateType
columns (SURVEY §1.3) — this operator runs ONLY at the boundary where a
frame leaves for such a scalar-only store.

Pure native expressions (concat_ws / date_format / coalesce) — no UDF, so
the sanitize projection stays inside whole-stage codegen and pushes
through to the export write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PASSTHROUGH = (T.IntegerType, T.LongType, T.ShortType, T.ByteType,
                T.DoubleType, T.FloatType, T.BooleanType, T.DecimalType)


def sanitize_for_scalar_store(df: DataFrame) -> DataFrame:
    """Per-column analog of the reference's per-value rules
    (vectorstore/store.py:367-381):

    - array<T>   -> comma-joined string (``",".join(str(x))``), null -> ""
    - date       -> "yyyy-MM-dd" string, null -> ""
    - timestamp  -> "yyyy-MM-dd HH:mm:ss" string, null -> ""
    - string     -> unchanged, null -> ""
    - int/float/bool/decimal -> pass through unchanged (already
      store-safe; columnar typing keeps their nulls — the reference's
      dict-of-values ""-fallback cannot retype a whole numeric column)
    - anything else (struct, map, binary) -> cast to string, null -> ""
    """
    out = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.ArrayType):
            # concat_ws natively casts elements and skips SQL nulls; a
            # null ARRAY still yields null, hence the coalesce
            flat = F.concat_ws(",", c)
            out.append(F.when(c.isNull(), F.lit("")).otherwise(flat)
                       .alias(f.name))
        elif isinstance(f.dataType, T.DateType):
            out.append(F.coalesce(F.date_format(c, "yyyy-MM-dd"),
                                  F.lit("")).alias(f.name))
        elif isinstance(f.dataType, T.TimestampType):
            out.append(F.coalesce(F.date_format(c, "yyyy-MM-dd HH:mm:ss"),
                                  F.lit("")).alias(f.name))
        elif isinstance(f.dataType, T.StringType):
            out.append(F.coalesce(c, F.lit("")).alias(f.name))
        elif isinstance(f.dataType, _PASSTHROUGH):
            out.append(c)
        else:
            out.append(F.coalesce(c.cast("string"), F.lit(""))
                       .alias(f.name))
    return df.select(*out)
