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


# ---------------------------------------------------------------- WebDataset
# The delivery format image+caption training actually consumes: tar
# shards of ({key}.{fmt}, {key}.txt) member pairs streamed sequentially
# by the data loader (webdataset/tarreader). The reference's export
# boundary is a JSON dump (pipeline.py save stages); a 10^10-pair corpus
# ships as O(10^5) such shards, built executor-side — bytes NEVER
# aggregate on the driver, each shard's tar is assembled inside the task
# that owns its rows.
WDS_SAMPLES_PER_SHARD = 32


def webdataset_shards(pages: DataFrame,
                      samples_per_shard: int = WDS_SAMPLES_PER_SHARD,
                      with_bytes: bool = True) -> DataFrame:
    """(shard_id, n_samples, size_bytes, tar_md5[, tar_bytes]) — one row
    per WebDataset shard.

    Shard assignment is a pure narrow map: the fixture's image_id embeds
    its global sequence (img-%08d), so shard = seq DIV k needs no global
    window (at 10^10 scale the sequence comes from the same two-level
    prefix-sum used by `packing.pack_shards`; the tar-assembly stage
    below is identical either way). Assembly = ONE shuffle
    (groupBy shard) + applyInPandas building the archive with stdlib
    tarfile — USTAR format, mtime=0, uid/gid 0, mode 0644, members in
    image_id order — so shard bytes are DETERMINISTIC: the md5 is
    reproducible across engines, partitionings, and reruns, which makes
    the sink itself value-hash checkable (the oracle rebuilds every tar
    out of Spark and compares digests)."""
    import hashlib
    import io
    import tarfile

    import pandas as pd

    src = pages.select(
        F.col("image_id"), F.col("bytes"), F.col("fmt"), F.col("caption"),
        F.expr(f"cast(substring(image_id, 5, 8) as bigint) "
               f"DIV {samples_per_shard}").alias("shard_id"))

    fields = ("shard_id int, n_samples int, size_bytes long, tar_md5 string"
              + (", tar_bytes binary" if with_bytes else ""))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("image_id")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tar:
            for _i, r in pdf.iterrows():
                for name, data in (
                        (f"{r['image_id']}.{r['fmt']}", bytes(r["bytes"])),
                        (f"{r['image_id']}.txt",
                         str(r["caption"]).encode("utf-8"))):
                    ti = tarfile.TarInfo(name=name)
                    ti.size = len(data)
                    ti.mtime = 0
                    ti.mode = 0o644
                    tar.addfile(ti, io.BytesIO(data))
        data = buf.getvalue()
        row = {"shard_id": [int(pdf["shard_id"].iloc[0])],
               "n_samples": [len(pdf)],
               "size_bytes": [len(data)],
               "tar_md5": [hashlib.md5(data).hexdigest()]}
        if with_bytes:
            row["tar_bytes"] = [data]
        return pd.DataFrame(row)

    return src.groupBy("shard_id").applyInPandas(build, schema=fields)


def read_webdataset(shards: DataFrame,
                    with_bytes: bool = True) -> DataFrame:
    """The loader side of the WebDataset cycle: parse shard tar bytes
    back into (image_id, fmt, caption[, bytes]) sample rows — what a
    training job's input pipeline does with the exported shards. One
    narrow mapInPandas over (shard_id, tar_bytes); each task streams
    only its own shards (tar members pair up as <id>.<fmt> + <id>.txt).
    Round-trip contract (pytest): read_webdataset(webdataset_shards(p))
    reproduces p's (image_id, fmt, caption, bytes) exactly.

    Truncated or corrupt shard bytes degrade to zero rows for that shard
    (the multimodal decode convention), never a task failure."""
    import io
    import tarfile

    import pandas as pd

    fields = ("image_id string, fmt string, caption string"
              + (", bytes binary" if with_bytes else ""))

    def parse(batches):
        for pdf in batches:
            for _i, r in pdf.iterrows():
                out: dict[str, dict] = {}
                try:
                    with tarfile.open(
                            fileobj=io.BytesIO(bytes(r["tar_bytes"])),
                            mode="r") as tar:
                        for m in tar.getmembers():
                            # extractfile() returns None for non-regular
                            # members (a corrupt typeflag byte can turn a
                            # file into a directory/link) — skip instead
                            # of AttributeError-ing the whole task.
                            if not m.isfile():
                                continue
                            f = tar.extractfile(m)
                            if f is None:
                                continue
                            stem, _, ext = m.name.rpartition(".")
                            d = out.setdefault(stem, {})
                            data = f.read()
                            if ext == "txt":
                                d["caption"] = data.decode("utf-8")
                            else:
                                d["fmt"] = ext
                                d["bytes"] = data
                except (tarfile.TarError, OSError, ValueError):
                    continue
                rows = [
                    {"image_id": k, "fmt": v.get("fmt", ""),
                     "caption": v.get("caption", ""),
                     **({"bytes": v.get("bytes", b"")}
                        if with_bytes else {})}
                    for k, v in sorted(out.items())]
                if rows:
                    yield pd.DataFrame(rows)

    return shards.select("shard_id", "tar_bytes").mapInPandas(
        parse, schema=fields)
