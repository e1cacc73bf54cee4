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
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_TOKENS = 40     # scaled-down analogs of the reference's 400/60/340
CHUNK_OVERLAP = 6
CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP
MIN_TOKENS = 5
MAX_SINGLE_TOKENS = 2 * CHUNK_TOKENS  # reference MAX_CHUNK_TOKENS=800 (2x)

# reference vectorstore/chunker.py:104
SECTION_HEADER_RX = re.compile(r"^(#{1,4})\s+(.+)$", re.MULTILINE)


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
            prefix_vals = (list(zip(*(pdf[c] for c in prefix_cols)))
                           if prefix_cols else [()] * len(pdf))
            for rid, text, pvals in zip(pdf[id_col], pdf[text_col],
                                        prefix_vals):
                prefix = (f"[{' | '.join(str(v) for v in pvals)}] "
                          if prefix_cols else "")
                for ci, ch in enumerate(_recursive_split(
                        str(text), max_tokens, overlap)):
                    txt = prefix + ch
                    cid = hashlib.sha256(
                        f"{rid}:{ci}:{txt[:100]}".encode()
                    ).hexdigest()[:12]
                    rows.append((rid, ci, txt, len(ch.split()), cid))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    id_col, "chunk_index", "chunk_text", "token_count",
                    "chunk_id"])

    id_type = dict(df.dtypes)[id_col]  # preserve the caller's id type
    return df.select(*cols).mapInPandas(
        fn, schema=f"{id_col} {id_type}, chunk_index int, chunk_text string, "
                   "token_count int, chunk_id string")


# --- source-type chunk dispatch (SURVEY V2) + strategies (V3) -------------
# reference vectorstore/chunker.py:171-216 routes 7 strategies on
# source_type; each strategy below reimplements its reference counterpart's
# semantics over the whitespace-token proxy counter.

def _tok(s: str) -> int:
    return len(s.split())


def _split_by_headers(text: str) -> list[tuple[str, str]]:
    """Markdown-header sectioning (reference chunker.py:484-509): returns
    (header-with-hashes, stripped content) pairs; leading content gets an
    empty header."""
    parts = SECTION_HEADER_RX.split(text)
    sections: list[tuple[str, str]] = []
    if not parts:
        return [("", text)]
    if parts[0].strip():
        sections.append(("", parts[0].strip()))
    i = 1
    while i < len(parts) - 2:
        header = f"{parts[i]} {parts[i + 1]}"
        sections.append((header, parts[i + 2].strip()))
        i += 3
    return sections or [("", text)]


def _chunk_blog(text: str, title: str, max_tokens: int, overlap: int,
                min_tokens: int) -> list[str]:
    """reference chunker.py:268-290: header sections, recursive within;
    later sub-chunks re-carry the section header for context."""
    chunks: list[str] = []
    for header, body in _split_by_headers(text):
        full = f"{title}\n{header}\n{body}" if header else f"{title}\n{body}"
        if _tok(full) <= max_tokens:
            if _tok(full) >= min_tokens:
                chunks.append(full.strip())
        else:
            for j, sc in enumerate(_recursive_split(full, max_tokens,
                                                    overlap)):
                if j > 0 and header and not sc.startswith(header):
                    sc = f"{header}\n{sc}"
                chunks.append(sc.strip())
    return chunks or [sc.strip() for sc in
                      _recursive_split(f"{title}\n{text}", max_tokens,
                                       overlap)]


def _chunk_docs(text: str, title: str, max_tokens: int, overlap: int,
                min_tokens: int) -> list[str]:
    """reference chunker.py:296-328: sections carry the 'A > B > C' header
    hierarchy path."""
    chunks: list[str] = []
    hierarchy: list[str] = [title]
    for header, body in _split_by_headers(text):
        if header:
            level = header.count("#")
            hierarchy = hierarchy[:level]
            hierarchy.append(header.lstrip("#").strip())
        path = " > ".join(hierarchy)
        full = f"{path}\n{body}"
        if _tok(full) <= max_tokens:
            if _tok(full) >= min_tokens:
                chunks.append(full.strip())
        else:
            for j, sc in enumerate(_recursive_split(full, max_tokens,
                                                    overlap)):
                if j > 0:
                    sc = f"{path}\n{sc}"
                chunks.append(sc.strip())
    return chunks or [sc.strip() for sc in
                      _recursive_split(f"{title}\n{text}", max_tokens,
                                       overlap)]


def _chunk_single(text: str, title: str, max_tokens: int, overlap: int,
                  min_tokens: int, max_single: int) -> list[str]:
    """reference chunker.py:459-469 (releases/benchmarks/comparisons)."""
    full = f"{title}\n{text}"
    t = _tok(full)
    if t <= max_single:
        return [full.strip()] if t >= min_tokens else []
    return [sc.strip() for sc in _recursive_split(full, max_tokens, overlap)]


def _chunk_generic(text: str, title: str, max_tokens: int,
                   overlap: int) -> list[str]:
    """reference chunker.py:475-478."""
    return [sc.strip() for sc in
            _recursive_split(f"{title}\n{text}", max_tokens, overlap)]


def _chunk_issue(text: str, title: str, comments: list[str], state: str,
                 max_tokens: int, overlap: int,
                 min_tokens: int) -> list[str]:
    """reference chunker.py:334-386: issue body first, then comments packed
    to the token budget with long-comment overflow splitting."""
    chunks: list[str] = []
    body = f"{title} (state: {state})\n{text}"
    if _tok(body) <= max_tokens:
        chunks.append(body.strip())
    else:
        chunks.extend(sc.strip() for sc in
                      _recursive_split(body, max_tokens, overlap))
    buf: list[str] = []
    bt = 0
    for c in comments or []:
        ct = f"Comment on '{title}': {c}"
        n = _tok(ct)
        if n >= max_tokens:
            if buf:
                chunks.append("\n\n".join(buf).strip())
                buf, bt = [], 0
            chunks.extend(sc.strip() for sc in
                          _recursive_split(ct, max_tokens, overlap))
        elif bt + n > max_tokens:
            if buf:
                chunks.append("\n\n".join(buf).strip())
            buf, bt = [ct], n
        else:
            buf.append(ct)
            bt += n
    if buf:
        merged = "\n\n".join(buf).strip()
        if _tok(merged) >= min_tokens:
            chunks.append(merged)
    return chunks


def _chunk_discussion(text: str, title: str, category: str,
                      answer: str | None, answered: bool, max_tokens: int,
                      overlap: int) -> list[str]:
    """reference chunker.py:392-418: body plus the accepted answer as a
    high-priority chunk."""
    body = f"{title} (discussion, category: {category})\n{text}"
    if _tok(body) <= max_tokens:
        chunks = [body.strip()]
    else:
        chunks = [sc.strip() for sc in
                  _recursive_split(body, max_tokens, overlap)]
    if answer and answered:
        at = f"Accepted answer for '{title}': {answer}"
        if _tok(at) <= max_tokens:
            chunks.append(at.strip())
        else:
            chunks.extend(sc.strip() for sc in
                          _recursive_split(at, max_tokens, overlap))
    return chunks


def _chunk_community(text: str, title: str, comments: list[str],
                     max_tokens: int, overlap: int,
                     min_tokens: int) -> list[str]:
    """reference chunker.py:424-453: post then one chunk per comment,
    skipping sub-minimum comments."""
    chunks: list[str] = []
    post = f"{title}\n{text}"
    if _tok(post) <= max_tokens:
        if _tok(post) >= min_tokens:
            chunks.append(post.strip())
    else:
        chunks.extend(sc.strip() for sc in
                      _recursive_split(post, max_tokens, overlap))
    for c in comments or []:
        ct = f"Community comment on '{title}': {c}"
        n = _tok(ct)
        if n < min_tokens:
            continue
        if n <= max_tokens:
            chunks.append(ct.strip())
        else:
            chunks.extend(sc.strip() for sc in
                          _recursive_split(ct, max_tokens, overlap))
    return chunks


SOURCE_STRATEGY = {
    "blog": "blog", "docs": "docs", "issue": "issue",
    "discussion": "discussion", "release": "single", "benchmark": "single",
    "comparison": "single", "hn": "community", "reddit": "community",
}


def dispatch_chunks(df: DataFrame, id_col: str, text_col: str,
                    title_col: str, type_col: str,
                    comments_col: str | None = None,
                    state_col: str | None = None,
                    category_col: str | None = None,
                    answer_col: str | None = None,
                    max_tokens: int = CHUNK_TOKENS,
                    overlap: int = CHUNK_OVERLAP,
                    min_tokens: int = MIN_TOKENS,
                    max_single: int = MAX_SINGLE_TOKENS) -> DataFrame:
    """SURVEY V2: route each record to its source-type strategy (unknown
    types fall back to generic), one Arrow mapInPandas pass. Emits
    (id, strategy, chunk_index, chunk_text, token_count, chunk_id) rows."""
    cols = [c for c in (id_col, text_col, title_col, type_col, comments_col,
                        state_col, category_col, answer_col) if c]

    def fn(iterator):
        for pdf in iterator:
            n_rows = len(pdf)
            ids, texts = pdf[id_col], pdf[text_col]
            titles, types = pdf[title_col], pdf[type_col]
            comments = (pdf[comments_col] if comments_col
                        else [None] * n_rows)
            states = pdf[state_col] if state_col else ["unknown"] * n_rows
            cats = pdf[category_col] if category_col else [""] * n_rows
            answers = pdf[answer_col] if answer_col else [None] * n_rows
            rows = []
            for rid, t, ti, ty, cs, st, cat, ans in zip(
                    ids, texts, titles, types, comments, states, cats,
                    answers):
                text, title = str(t or ""), str(ti or "")
                if not text.strip():
                    continue  # reference chunker.py:173-174
                strat = SOURCE_STRATEGY.get(ty, "generic")
                cl = list(cs) if cs is not None else []
                if strat == "blog":
                    chs = _chunk_blog(text, title, max_tokens, overlap,
                                      min_tokens)
                elif strat == "docs":
                    chs = _chunk_docs(text, title, max_tokens, overlap,
                                      min_tokens)
                elif strat == "issue":
                    chs = _chunk_issue(text, title, cl, str(st), max_tokens,
                                       overlap, min_tokens)
                elif strat == "discussion":
                    chs = _chunk_discussion(text, title, str(cat),
                                            ans, ans is not None,
                                            max_tokens, overlap)
                elif strat == "single":
                    chs = _chunk_single(text, title, max_tokens, overlap,
                                        min_tokens, max_single)
                elif strat == "community":
                    chs = _chunk_community(text, title, cl, max_tokens,
                                           overlap, min_tokens)
                else:
                    chs = _chunk_generic(text, title, max_tokens, overlap)
                for ci, ch in enumerate(chs):
                    cid = hashlib.sha256(
                        f"{rid}:{ci}:{ch[:100]}".encode()).hexdigest()[:12]
                    rows.append((rid, strat, ci, ch, len(ch.split()), cid))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    id_col, "strategy", "chunk_index", "chunk_text",
                    "token_count", "chunk_id"])

    id_type = dict(df.dtypes)[id_col]
    return df.select(*cols).mapInPandas(
        fn, schema=f"{id_col} {id_type}, strategy string, chunk_index int, "
                   "chunk_text string, token_count int, chunk_id string")


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
