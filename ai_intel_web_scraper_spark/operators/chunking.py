"""Chunking operators (SURVEY V1-V8).

Two tiers:
- `token_window_chunks` — the fixed sliding-window strategy (reference
  vectorstore/chunker.py:571-588 `_hard_split`) as a PURE DataFrame
  composition (sequence + posexplode + slice) — SQL-checkable and fully
  codegen'd.
- `recursive_chunks` — the separator-priority recursive splitter with
  overlap and context prefix (reference chunker.py:484-569, 145-153) inside
  one Arrow-batched mapInPandas pass (per-row custom logic Spark can't
  express natively); emits exploded chunk rows with deterministic ids.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_TOKENS = 40     # scaled-down analogs of the reference's 400/60/340
CHUNK_OVERLAP = 6
CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP
MIN_TOKENS = 5


def token_window_chunks(df: DataFrame, id_col: str, text_col: str,
                        window: int = CHUNK_TOKENS,
                        stride: int = CHUNK_STRIDE) -> DataFrame:
    """Fixed sliding window over whitespace tokens: chunk k covers tokens
    [k*stride, k*stride+window). Native plan; deterministic chunk ids via
    sha2 (SURVEY V8, reference chunker.py:88-91)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), words.alias("_w"), F.size(words).alias("_n"))
    starts = F.sequence(F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)),
                        F.lit(stride))
    out = (base.select(F.col(id_col), "_w", "_n",
                       F.posexplode(starts).alias("chunk_index", "_start"))
           .withColumn("chunk_text",
                       F.concat_ws(" ", F.slice("_w", F.col("_start") + 1,
                                                F.lit(window))))
           .withColumn("token_count",
                       F.least(F.col("_n") - F.col("_start"), F.lit(window)))
           .where(F.col("token_count") >= MIN_TOKENS)
           .select(id_col, "chunk_index", "chunk_text", "token_count"))
    return out.withColumn(
        "chunk_id",
        F.substring(F.sha2(F.concat_ws(
            ":", F.col(id_col), F.col("chunk_index"),
            F.substring("chunk_text", 1, 100)), 256), 1, 12))


def _recursive_split(text: str, max_tokens: int, overlap: int) -> list[str]:
    """Separator-priority split + overlap merge (reference semantics of
    chunker.py:511-569, simplified separators)."""
    seps = ["\n## ", "\n", ". ", " "]

    def split_by(t: str, si: int) -> list[str]:
        toks = t.split()
        if len(toks) <= max_tokens:
            return [t] if t.strip() else []
        if si >= len(seps):
            return [" ".join(toks[i:i + max_tokens])
                    for i in range(0, len(toks), max_tokens - overlap)]
        parts = [p for p in t.split(seps[si]) if p.strip()]
        if len(parts) <= 1:
            return split_by(t, si + 1)
        out: list[str] = []
        for p in parts:
            out.extend(split_by(p, si + 1))
        return out

    pieces = split_by(text, 0)
    # greedy merge to <= max_tokens with token overlap between neighbors;
    # the overlap carry is DROPPED when carry+piece would overflow, so
    # every emitted chunk is <= max_tokens (pieces are <= max_tokens by
    # construction of split_by)
    merged: list[str] = []
    cur: list[str] = []
    for p in pieces:
        ptoks = p.split()
        if len(cur) + len(ptoks) <= max_tokens:
            cur.extend(ptoks)
        else:
            if cur:
                merged.append(" ".join(cur))
            carry = cur[-overlap:] if overlap and cur else []
            cur = carry + ptoks
            if len(cur) > max_tokens:
                cur = ptoks
    if cur:
        merged.append(" ".join(cur))
    return merged


def recursive_chunks(df: DataFrame, id_col: str, text_col: str,
                     prefix_cols: list[str] | None = None,
                     max_tokens: int = CHUNK_TOKENS,
                     overlap: int = CHUNK_OVERLAP) -> DataFrame:
    """Recursive splitter with context-prefix enrichment (SURVEY V3/V4/V7)
    in one mapInPandas pass; emits (id, chunk_index, chunk_text, token_count,
    chunk_id) rows."""
    prefix_cols = prefix_cols or []
    cols = [id_col, text_col, *prefix_cols]

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for _, r in pdf.iterrows():
                prefix = (f"[{' | '.join(str(r[c]) for c in prefix_cols)}] "
                          if prefix_cols else "")
                for ci, ch in enumerate(_recursive_split(
                        str(r[text_col]), max_tokens, overlap)):
                    txt = prefix + ch
                    cid = hashlib.sha256(
                        f"{r[id_col]}:{ci}:{txt[:100]}".encode()
                    ).hexdigest()[:12]
                    rows.append((r[id_col], ci, txt, len(ch.split()), cid))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    id_col, "chunk_index", "chunk_text", "token_count",
                    "chunk_id"])

    id_type = dict(df.dtypes)[id_col]  # preserve the caller's id type
    return df.select(*cols).mapInPandas(
        fn, schema=f"{id_col} {id_type}, chunk_index int, chunk_text string, "
                   "token_count int, chunk_id string")


BIN_TOKEN_BUDGET = 25  # scaled-down analog of the reference's issue budget


def greedy_bin_pack(df: DataFrame, group_cols: list[str], order_cols: list[str],
                    weight_col: str, budget: int = BIN_TOKEN_BUDGET) -> DataFrame:
    """SURVEY V6: greedy sequential bin-packing per group (reference
    vectorstore/chunker.py:334-386 packs issue comments into token-budget
    bins in comment order). Start a new bin when adding the next item would
    exceed `budget` (oversized single items get their own bin).

    Running-threshold-reset is NOT expressible with plain SQL windows
    (the reset depends on its own output), so each group runs sequentially
    inside applyInPandas — groups are independent and parallel, the
    per-group scan is O(rows)."""
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        bins = []
        cur, acc = 0, 0
        for w in pdf[weight_col]:
            w = int(w)
            if acc > 0 and acc + w > budget:
                cur += 1
                acc = 0
            acc += w
            bins.append(cur)
        out = pdf[group_cols + order_cols + [weight_col]].copy()
        out["bin_index"] = pd.Series(bins, index=pdf.index, dtype="int32")
        return out

    schema = (df.select(*group_cols, *order_cols, weight_col)
              .withColumn("bin_index", F.lit(0).cast("int")).schema)
    return df.groupBy(*group_cols).applyInPandas(pack, schema=schema)
