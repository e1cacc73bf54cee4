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

from pyspark.sql import DataFrame, Window
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
    src = pages.select(
        F.col("image_id"), F.col("bytes"), F.col("fmt"), F.col("caption"),
        F.expr(f"cast(substring(image_id, 5, 8) as bigint) "
               f"DIV {samples_per_shard}").alias("shard_id"))
    return _assemble_shards(src, with_bytes)


def _assemble_shards(src: DataFrame, with_bytes: bool) -> DataFrame:
    """Shared tar-assembly stage: (image_id, bytes, fmt, caption,
    shard_id) -> one deterministic USTAR archive per shard (the
    `webdataset_shards` docstring's recipe; also the byte-budget
    variant's sink)."""
    import hashlib
    import io
    import tarfile

    import pandas as pd

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
                         ("" if r["caption"] is None
                          else str(r["caption"])).encode("utf-8"))):
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


def tar_footprint_col(len_col) -> F.Column:
    """Exact USTAR member footprint: 512-byte header + payload padded to
    a 512 multiple. Integer-exact (DIV), so both engines agree."""
    return F.expr(f"512 + ((({len_col}) + 511) DIV 512) * 512")


def webdataset_shards_by_bytes(pages: DataFrame, byte_budget: int,
                               with_bytes: bool = True,
                               n_buckets: int | None = None) -> DataFrame:
    """WebDataset shards under a BYTE budget — the constraint real
    training-shard layouts carry (~1 GiB tars), where fixed
    samples-per-shard drifts with payload size. A sample's weight is its
    exact tar footprint (image member + caption member, headers and
    512-padding included); a sample lands in the shard where its
    cumulative START offset falls (`pack_shards`' quantized-prefix rule
    — no sequential reset dependence, so the global pack is a TWO-LEVEL
    prefix sum, never a single-partition window). Shard tar sizes may
    exceed the budget by at most one sample plus the tar trailer
    (end-of-archive blocks + record padding), exactly like a
    streaming-pack writer.

    Sample order is the image_id-embedded global sequence, identical to
    `webdataset_shards`; assembly is the shared deterministic tar stage,
    so the md5s remain engine/partitioning/rerun-reproducible."""
    if byte_budget < 1:
        raise ValueError(f"byte_budget must be >= 1, got {byte_budget}")
    sp = pages.sparkSession
    if n_buckets is None:
        n_buckets = max(8, sp.sparkContext.defaultParallelism)
    seq = F.expr("cast(substring(image_id, 5, 8) as bigint)")
    # a NULL caption tars as an empty .txt member (assembly rule below);
    # the weight model must agree AND never go NULL mid-prefix-sum
    w = (tar_footprint_col("length(bytes)")
         + tar_footprint_col("octet_length(cast(coalesce(caption, '') "
                             "as string))"))
    src = pages.select("image_id", "bytes", "fmt", "caption",
                       seq.alias("_seq"), w.alias("_w"))
    # constant-size driver read (one long) to size the bucket ranges
    mx = src.agg(F.max("_seq")).first()[0]
    step = max(1, -((int(mx) + 1) // -n_buckets))
    src = src.withColumn("_bucket", F.expr(f"_seq DIV {step}"))
    w_in = (Window.partitionBy("_bucket").orderBy("_seq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    src = src.withColumn("_cum_in", F.sum("_w").over(w_in))
    w_pre = (Window.orderBy("_bucket")
             .rowsBetween(Window.unboundedPreceding, -1))
    bpre = (src.groupBy("_bucket").agg(F.sum("_w").alias("_bw"))
            .withColumn("_bpre", F.coalesce(F.sum("_bw").over(w_pre),
                                            F.lit(0).cast("long")))
            .select("_bucket", "_bpre"))
    packed = (src.join(F.broadcast(bpre), "_bucket")
              .withColumn("_start",
                          F.col("_bpre") + F.col("_cum_in") - F.col("_w"))
              .withColumn("shard_id",
                          F.expr(f"cast(_start DIV {byte_budget} as int)"))
              .select("image_id", "bytes", "fmt", "caption", "shard_id"))
    return _assemble_shards(packed, with_bytes)


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
