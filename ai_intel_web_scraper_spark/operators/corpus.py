"""Corpus-hygiene operators for training-data pipelines: Gopher-style
repetition signals, benchmark decontamination (n-gram overlap join), and
PII detection/redaction.

These extend the reference's process stage (`processors/cleaner.py` /
`processors/quality_filter.py` remove boilerplate and low-quality records)
with the three hygiene passes a 100 TB pretraining pipeline runs next:
repetition filtering (Rae et al. 2021 "Gopher" §A1.1 repetition rules),
eval-set decontamination (Brown et al. 2020 GPT-3 appendix C n-gram
overlap), and PII scrubbing. Everything is native Spark expressions —
explode + groupBy for the per-doc n-gram counting (hash-partitioned by
doc id, no UDFs, no driver collects), a broadcast semi-join against the
benchmark gram set for decontamination, and regexp chains for PII.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# n-gram sizes for the repetition signals (Gopher uses 2-grams for the
# top-gram fraction and 5..10-grams for the duplicate-gram fraction) and
# for decontamination (real pipelines use 8-13 word grams; the synthetic
# word-soup corpus has a ~40-word vocabulary, so the entry query uses 4
# to get a non-trivial hit set at test scale).
TOP_GRAM_N = 2
DUP_GRAM_N = 5
DECONTAM_N = 4

# Hygiene-pipeline keep/drop thresholds (integer-ratio rules so both
# engines compare exact integers; values sit near the synthetic corpus'
# p95-p99 so each stage does non-trivial work at test scale):
# drop when DEN*(n_words - n_distinct_words) >= NUM*n_words ...
REP_DUPWORD_NUM, REP_DUPWORD_DEN = 7, 10     # dup-word mass >= 0.7
REP_TOP2_DEN = 10                            # top-2-gram ratio >= 0.1
LM_KEEP_MICRONATS = -5_815_000               # drop when score <= n * this

# PII patterns — kept to the Java-regex/RE2 common dialect so the DuckDB
# oracle replays them verbatim.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def words_col(text) -> F.Column:
    """Whitespace word split, matching the repo-wide SQL-replayable
    convention (`_sql_words` in `__spark_entry__.py`). NULL text is
    treated as empty text on every path (narrow UDF, exploded, oracle) so
    the three stay bit-identical on nullable sources."""
    return F.split(F.trim(F.coalesce(text, F.lit(""))), r"\s+")


def word_grams(words: F.Column, n: int) -> F.Column:
    """All word n-grams of a word array as space-joined strings; empty
    array when the doc has fewer than n words (sequence() would otherwise
    count DOWN from 1 and fabricate grams)."""
    if n == 1:
        return words
    idx = F.sequence(F.lit(1), F.size(words) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>"))


_REP_SCHEMA = T.StructType([
    T.StructField("n_words", T.LongType()),
    T.StructField("n_distinct_words", T.LongType()),
    T.StructField("top2_gram", T.StringType()),
    T.StructField("top2_cnt", T.LongType()),
    T.StructField("top2_total", T.LongType()),
    T.StructField("dup5_hits", T.LongType()),
    T.StructField("dup5_total", T.LongType()),
])


def _split_words(s: str | None) -> list[str]:
    # parity with F.split(F.trim(coalesce(text, '')), r"\s+"): SQL trim
    # strips ONLY spaces (CLAUDE.md gotcha) so strip(' ') not str.strip();
    # re.ASCII matches Java/RE2 \s (ASCII-only) vs Python's Unicode \s,
    # which would split NBSP/unicode whitespace the JVM side keeps
    return re.split(r"\s+", (s or "").strip(" "), flags=re.ASCII)


def repetition_signals(df: DataFrame, id_col: str, text_col: str,
                       top_n: int = TOP_GRAM_N,
                       dup_n: int = DUP_GRAM_N) -> DataFrame:
    """Per-document repetition signals (Gopher §A1.1 analog), computed in
    ONE vectorized Arrow UDF — a narrow map with NO shuffle. The signals
    are pure per-row functions, so at 100 TB this must not repartition the
    corpus; the explode+groupBy formulation (kept as
    :func:`repetition_signals_exploded`, parity-tested bit-identical) pays
    two corpus-wide shuffles for the same answer.

    Output columns match :func:`repetition_signals_exploded` exactly:
    integer counts (hash-stable) plus the derived ``dup_word_frac``.
    """
    @F.pandas_udf(_REP_SCHEMA)
    def rep_udf(texts: pd.Series) -> pd.DataFrame:
        out = []
        for s in texts:
            w = _split_words(s)
            nw, nd = len(w), len(set(w))
            g2 = [" ".join(w[i:i + top_n]) for i in range(nw - top_n + 1)]
            if g2:
                c2 = Counter(g2)
                best_cnt = max(c2.values())
                best = min(g for g, c in c2.items() if c == best_cnt)
            else:
                best, best_cnt = "", 0
            g5 = Counter(" ".join(w[i:i + dup_n])
                         for i in range(nw - dup_n + 1))
            tot5 = sum(g5.values())
            hits5 = sum(c for c in g5.values() if c > 1)
            out.append((nw, nd, best, best_cnt, len(g2), hits5, tot5))
        return pd.DataFrame(out, columns=[f.name for f in _REP_SCHEMA])

    sig = F.col("_sig")
    return (df.select(F.col(id_col).alias("doc_id"),
                      rep_udf(F.col(text_col)).alias("_sig"))
            .select("doc_id", sig["n_words"].alias("n_words"),
                    sig["n_distinct_words"].alias("n_distinct_words"),
                    F.round(F.lit(1.0) - sig["n_distinct_words"]
                            / F.greatest(sig["n_words"], F.lit(1)), 6)
                    .alias("dup_word_frac"),
                    sig["top2_gram"].alias("top2_gram"),
                    sig["top2_cnt"].alias("top2_cnt"),
                    sig["top2_total"].alias("top2_total"),
                    sig["dup5_hits"].alias("dup5_hits"),
                    sig["dup5_total"].alias("dup5_total")))


def repetition_signals_exploded(df: DataFrame, id_col: str, text_col: str,
                                top_n: int = TOP_GRAM_N,
                                dup_n: int = DUP_GRAM_N) -> DataFrame:
    """Per-document repetition signals (Gopher §A1.1 analog):

    - ``n_words`` / ``n_distinct_words`` — duplicate-word mass
      (``dup_word_frac`` = 1 - distinct/total);
    - ``top2_gram`` / ``top2_cnt`` / ``top2_total`` — the most frequent
      word ``top_n``-gram (ties broken lexicographically) and its
      occurrence count over the doc's gram count: high ⇒ loopy text;
    - ``dup5_hits`` / ``dup5_total`` — how many ``dup_n``-gram
      occurrences belong to a gram seen more than once in the doc
      (``dup_gram_frac`` = hits/total).

    Counts are exact integers (hash-stable across engines); the derived
    fractions are also emitted for filtering convenience. Distributed
    shape: one explode + groupBy per gram size, keyed on (doc, gram) —
    partition-local partial aggregation does the heavy lifting, and the
    per-doc joins are equi-joins on the id. No UDFs, no collects.
    """
    did = F.col(id_col)
    words = words_col(F.col(text_col))
    base = df.select(
        did.alias("doc_id"),
        words.alias("w"),
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"))

    g_top = (base.select("doc_id", F.explode(word_grams(F.col("w"), top_n))
                         .alias("gram"))
             .groupBy("doc_id", "gram").agg(F.count("*").alias("cnt")))
    w_top = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("gram"))
    top = (g_top.withColumn("_rn", F.row_number().over(w_top))
           .where(F.col("_rn") == 1)
           .select("doc_id", F.col("gram").alias("top2_gram"),
                   F.col("cnt").alias("top2_cnt")))

    g_dup = (base.select("doc_id", F.explode(word_grams(F.col("w"), dup_n))
                         .alias("gram"))
             .groupBy("doc_id", "gram").agg(F.count("*").alias("cnt")))
    dup = (g_dup.groupBy("doc_id").agg(
        F.sum("cnt").alias("dup5_total"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
        .alias("dup5_hits")))

    out = (base.drop("w")
           .join(top, "doc_id", "left")
           .join(dup, "doc_id", "left")
           .select(
               "doc_id", "n_words", "n_distinct_words",
               F.round(F.lit(1.0) - F.col("n_distinct_words")
                       / F.greatest(F.col("n_words"), F.lit(1)), 6)
               .alias("dup_word_frac"),
               F.coalesce("top2_gram", F.lit("")).alias("top2_gram"),
               F.coalesce("top2_cnt", F.lit(0)).cast("long")
               .alias("top2_cnt"),
               F.greatest(F.col("n_words") - F.lit(top_n - 1), F.lit(0))
               .cast("long").alias("top2_total"),
               F.coalesce("dup5_hits", F.lit(0)).cast("long")
               .alias("dup5_hits"),
               F.coalesce("dup5_total", F.lit(0)).cast("long")
               .alias("dup5_total")))
    return out


def gram_hash_udf(n: int):
    """text -> array of DISTINCT 64-bit word-n-gram hashes in one Arrow
    pass (same rationale as `dedup.shingle_hash_udf`: the interpreted
    transform/slice/concat_ws chain re-evaluates per row on the corpus
    join side; one UDF emitting longs is ~10x cheaper and only fixed-size
    hashes cross back). Case-preserving; blake2b-8 like the dedup
    shingles — a collision can only ADD a contamination flag, which is
    the safe direction for decontamination."""
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fn(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            w = _split_words(t)
            grams = {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
            out.append([
                int.from_bytes(hashlib.blake2b(
                    g.encode(), digest_size=8).digest(), "little",
                    signed=True)
                for g in sorted(grams)])
        return pd.Series(out)
    return fn


def contamination_hits(docs: DataFrame, bench: DataFrame, id_col: str,
                       text_col: str, n: int = DECONTAM_N) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C analog): flag every doc
    sharing at least one word ``n``-gram with the benchmark corpus.
    Returns (doc_id, n_hit_grams) for contaminated docs only, where
    ``n_hit_grams`` counts DISTINCT benchmark grams present in the doc.

    Scale shape: both sides emit per-row DISTINCT gram hashes from one
    Arrow UDF (no interpreted HOF chain, only longs leave Python); the
    benchmark hash set is the small side (eval suites are ~10^5 rows vs
    10^10 docs) — distinct it and broadcast. The doc side explodes and
    hits the broadcast join FIRST (map-side, no shuffle of the corpus),
    and because each doc's hash array is already distinct, the per-doc
    count is a plain count — the only shuffle is over the tiny matched
    set.
    """
    grams = gram_hash_udf(n)
    bench_grams = (bench.select(
        F.explode(grams(F.col(text_col))).alias("gram_h")).distinct())
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(grams(F.col(text_col))).alias("gram_h"))
    return (doc_grams.join(F.broadcast(bench_grams), "gram_h")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_hit_grams")))


# ------------------------------------------------- LM perplexity filter
#
# CCNet-style language-model quality filtering (Wenzek et al. 2020): score
# each document under a char-bigram LM trained on a FIXED reference corpus
# (CCNet trains KenLM on Wikipedia — the reference is external and
# constant, never the corpus being scored). Log-probs are quantized to
# integer micro-nats once, in Python, so both engines sum exact integers —
# no cross-engine float/log divergence possible.

LM_QUANT = 1_000_000  # 1 micro-nat

# Deterministic stand-in for the external reference corpus (public
# pangram-style sentences over the synthetic corpus' character set).
LM_REF_CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast query scans the table and joins the rows",
    "sort merge join beats hash join when data is sorted",
    "spark shuffles data between stages by partition key",
    "small batches stream through the window in order",
    "the filter pushes down to the scan and prunes columns",
    "group by key then aggregate the values per group",
    "a big sorted run spills to disk under memory pressure",
]


def char_bigram_logprobs(ref_texts: list[str] | None = None,
                         quant: int = LM_QUANT) -> tuple[dict, int]:
    """Train the reference char-bigram LM: add-one-smoothed bigram
    probabilities over the reference texts, quantized to integer
    micro-nats (floor). Returns (``{bigram: q_logprob}``, ``q_oov``) —
    constants, computed once; the oracle inlines the same integers."""
    ref_texts = LM_REF_CORPUS if ref_texts is None else ref_texts
    counts = Counter(t[i:i + 2] for t in ref_texts
                     for i in range(len(t) - 1))
    vocab = {c for t in ref_texts for c in t}
    denom = sum(counts.values()) + len(vocab) ** 2
    probs = {bg: math.floor(math.log((c + 1) / denom) * quant)
             for bg, c in counts.items()}
    q_oov = math.floor(math.log(1.0 / denom) * quant)
    return probs, q_oov


def lm_score(df: DataFrame, id_col: str, text_col: str,
             probs: dict | None = None, q_oov: int | None = None) -> DataFrame:
    """Per-document LM score under the reference char-bigram model, in one
    vectorized Arrow UDF (narrow map, no shuffle — the model is a
    constant-size broadcast, same shape as the IVF codebook). Emits exact
    integers: ``n_bigrams``, ``oov_bigrams`` (bigrams unseen in the
    reference), and ``score_micronats`` (sum of quantized log-probs; more
    negative per bigram = less reference-like ⇒ the CCNet keep/discard
    threshold is ``score_micronats / n_bigrams``)."""
    if probs is None:
        probs, q_oov = char_bigram_logprobs()
    elif q_oov is None:
        raise ValueError("lm_score: probs and q_oov must be passed "
                         "together (both from char_bigram_logprobs)")

    schema = T.StructType([
        T.StructField("n_bigrams", T.LongType()),
        T.StructField("oov_bigrams", T.LongType()),
        T.StructField("score_micronats", T.LongType()),
    ])

    @F.pandas_udf(schema)
    def score_udf(texts: pd.Series) -> pd.DataFrame:
        out = []
        for s in texts:
            s = s or ""
            n = max(len(s) - 1, 0)
            oov = score = 0
            for i in range(n):
                q = probs.get(s[i:i + 2])
                if q is None:
                    oov += 1
                    score += q_oov
                else:
                    score += q
            out.append((n, oov, score))
        return pd.DataFrame(out,
                            columns=["n_bigrams", "oov_bigrams",
                                     "score_micronats"])

    sig = F.col("_lm")
    return (df.select(F.col(id_col).alias("doc_id"),
                      score_udf(F.col(text_col)).alias("_lm"))
            .select("doc_id", sig["n_bigrams"].alias("n_bigrams"),
                    sig["oov_bigrams"].alias("oov_bigrams"),
                    sig["score_micronats"].alias("score_micronats")))


def pii_counts(text) -> list[F.Column]:
    """PII occurrence counts (email / phone / IPv4) over the raw text."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)).cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)).cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IP), 0)).cast("long")
        .alias("n_ips"),
    ]


def pii_redact(text) -> F.Column:
    """Redact PII in-place. Replacement order (email, phone, IP) is part
    of the contract — the oracle replays the same chain."""
    out = F.regexp_replace(text, PII_EMAIL, "[EMAIL]")
    out = F.regexp_replace(out, PII_PHONE, "[PHONE]")
    return F.regexp_replace(out, PII_IP, "[IP]")


# ----------------------------- exact-substring duplicate spans
#
# Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
# Better") ExactSubstr analog: find every maximal text span whose word
# n-grams all occur >= min_count times corpus-wide, i.e. runs of text
# duplicated verbatim somewhere else (cross- OR within-document). Their
# suffix-array formulation is single-machine; the distributed shape here
# is positional-n-gram seeding: a duplicated run of L >= n words shows up
# as L-n+1 consecutive duplicated n-gram starts, so merging consecutive
# duplicated positions (gap <= n) reconstructs the maximal span.
#
# Scale shape (100 TB): one Arrow UDF emits positional 60-bit gram hashes
# (only longs leave Python); the duplicate-hash set comes from a partial-
# aggregated groupBy on the hash alone (8-byte rows shuffle, never text);
# positions rejoin it with a shuffle semi-join (the dup set is corpus-
# sized in the worst case, so no broadcast assumption); the island merge
# is a per-doc window after one shuffle on doc_id. The md5-60bit hash is
# the repo's DuckDB-replayable scheme, so cross-engine parity is exact
# even under (cosmically unlikely) collisions.

DUPSPAN_N = 10          # words; Lee et al. use 50 BPE tokens — the
                        # synthetic corpus' planted dup runs are shorter,
                        # so test scale seeds on 10-word grams
DUPSPAN_MIN_COUNT = 2


def gram_pos_hash_udf(n: int):
    """text -> POSITIONAL word-n-gram hash array (element i = the gram
    starting at word offset i), 60-bit md5-derived so DuckDB replays each
    hash verbatim as ('0x' || substring(md5(gram), 1, 15))::BIGINT."""
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fn(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            w = _split_words(t)
            out.append([
                int(hashlib.md5(" ".join(w[i:i + n]).encode())
                    .hexdigest()[:15], 16)
                for i in range(len(w) - n + 1)])
        return pd.Series(out)
    return fn


def duplicate_spans(docs: DataFrame, id_col: str, text_col: str,
                    n: int = DUPSPAN_N,
                    min_count: int = DUPSPAN_MIN_COUNT) -> DataFrame:
    """Maximal duplicated spans per document: (doc_id, span_start,
    span_end) in 0-based word offsets, end exclusive. A span is maximal —
    consecutive duplicated gram starts with gaps <= n are merged, so each
    row is one verbatim-duplicated run of >= n words."""
    g = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(gram_pos_hash_udf(n)(F.col(text_col)))
        .alias("pos", "gh"))
    dup = (g.groupBy("gh").agg(F.count("*").alias("_c"))
           .where(F.col("_c") >= min_count).select("gh"))
    hits = g.join(dup, "gh", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = (hits
           .withColumn("_brk", F.when(
               F.col("pos") - F.lag("pos").over(w) <= n, F.lit(0))
               .otherwise(F.lit(1)))
           .withColumn("_isl", F.sum("_brk").over(w_cum)))
    return (isl.groupBy("doc_id", "_isl")
            .agg(F.min("pos").cast("long").alias("span_start"),
                 (F.max("pos") + F.lit(n)).cast("long").alias("span_end"))
            .select("doc_id", "span_start", "span_end"))


_STRIP_SCHEMA = T.StructType([
    T.StructField("text_clean", T.StringType()),
    T.StructField("n_removed_words", T.LongType()),
])


def strip_duplicate_spans(docs: DataFrame, id_col: str, text_col: str,
                          n: int = DUPSPAN_N,
                          min_count: int = DUPSPAN_MIN_COUNT) -> DataFrame:
    """Materialize the dedup: remove every duplicated span's words from
    the text (all copies are removed, as in Lee et al.). Returns
    (doc_id, text_clean, n_removed_words) for ALL docs — untouched docs
    pass through with n_removed_words = 0.

    The cut itself is one Arrow UDF over (text, collected spans) — a
    narrow map after the per-doc span collect; span lists are tiny
    relative to text so the join stays cheap."""
    spans = duplicate_spans(docs, id_col, text_col, n, min_count)
    per = (spans.groupBy("doc_id")
           .agg(F.collect_list(
               F.array("span_start", "span_end")).alias("_spans")))
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("_text"))
    j = base.join(per, "doc_id", "left")

    @F.pandas_udf(_STRIP_SCHEMA)
    def strip_udf(text: pd.Series, spans: pd.Series) -> pd.DataFrame:
        out = []
        for t, sp in zip(text, spans):
            w = _split_words(t)
            drop = set()
            for s in (sp if sp is not None else []):
                drop.update(range(int(s[0]), min(int(s[1]), len(w))))
            kept = [x for i, x in enumerate(w) if i not in drop]
            out.append((" ".join(kept), len(drop)))
        return pd.DataFrame(out, columns=[f.name for f in _STRIP_SCHEMA])

    sig = F.col("_out")
    return (j.select("doc_id",
                     strip_udf(F.col("_text"), F.col("_spans"))
                     .alias("_out"))
            .select("doc_id", sig["text_clean"].alias("text_clean"),
                    sig["n_removed_words"].alias("n_removed_words")))
