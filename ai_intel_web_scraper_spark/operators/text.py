"""Text-processing operators (SURVEY P3-P6, P13, C12, C14; plus the
training-data-pipeline additions: language ID, quality scoring, token
counting, document fingerprinting).

All implemented with native Column expressions — no Python in the hot path.
The keyword constants here are the single source of truth: the DuckDB oracle
SQL in __spark_entry__ is *generated from these same dicts*, so the Spark
implementation and the oracle cannot drift.

Reference semantics:
- relevance (C14): fraction of keywords contained, case-insensitive
  (reference scrapers/blog_scraper.py:217-223)
- topic tagging (P5): per-topic keyword score, top-3 above threshold
  (reference processors/topic_tagger.py:62-142); containment-based here
- sentiment (P13): pos/neg keyword vote -> 4-way label
  (reference scrapers/community_scraper.py:294-319)
- quality filter (P6): word-count floor + reason accounting
  (reference processors/quality_filter.py:67-95)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOPICS: dict[str, list[str]] = {
    "distributed": ["spark", "merge", "window", "hash", "shuffle join"],
    "performance": ["fast", "slow", "small", "sort", "fast table"],
    "query_engine": ["query", "scan", "filter", "join", "query scan"],
    "storage": ["table", "row", "key", "batch"],
}
# reference processors/topic_tagger.py:28,67: min score 0.01, top 3,
# multi-word keywords weighted 1 + 0.5/space
TOPIC_MIN_SCORE = 0.01
TOPIC_TOP_N = 3


def topic_weight(kw: str) -> float:
    """reference topic_tagger.py:67 — multi-word keywords score higher."""
    return 1.0 + 0.5 * kw.count(" ")

POS_WORDS = ["fast", "group", "value", "merge"]
NEG_WORDS = ["slow", "small", "scan", "batch"]

LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "data", "value"],
    "es": ["el", "la", "los"],
    "fr": ["le", "une", "des"],
}

TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
MIN_WORDS_QUALITY = 40
MIN_CHARS_QUALITY = 120


def word_count_col(text: Column) -> Column:
    """SURVEY P3: len(text.split()) — whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def contains_count_col(text_lower: Column, words: list[str]) -> Column:
    """Number of `words` contained (substring, case-insensitive) in text."""
    c = F.lit(0)
    for w in words:
        c = c + F.when(text_lower.contains(w.lower()), 1).otherwise(0)
    return c


def relevance_score_col(text: Column, keywords: list[str]) -> Column:
    """SURVEY C14: fraction of priority keywords present."""
    return (contains_count_col(F.lower(text), keywords)
            / F.lit(float(len(keywords))))


def sentiment_label_col(text: Column) -> Column:
    """SURVEY P13: keyword-count vote -> positive/negative/mixed/neutral."""
    lo = F.lower(text)
    pos = contains_count_col(lo, POS_WORDS)
    neg = contains_count_col(lo, NEG_WORDS)
    return (F.when(pos > neg, "positive")
            .when(neg > pos, "negative")
            .when((pos == neg) & (pos > 0), "mixed")
            .otherwise("neutral"))


def topic_score_col(text_lower: Column, keywords: list[str]) -> Column:
    """Reference scoring (topic_tagger.py:121-142): per keyword, COUNT of
    \\b-bounded matches times the keyword weight; normalized by the number
    of keywords. Native regexp_count — stays in codegen."""
    s = F.lit(0.0)
    for kw in keywords:
        s = s + (F.regexp_count(text_lower, F.lit(rf"\b{kw}\b"))
                 * F.lit(topic_weight(kw)))
    return s / F.lit(float(len(keywords)))


def topic_scores(df: DataFrame, id_col: str, text_col: str,
                 topics: dict[str, list[str]] | None = None,
                 min_score: float = TOPIC_MIN_SCORE,
                 top_n: int = TOPIC_TOP_N) -> DataFrame:
    """SURVEY P5 at reference fidelity (topic_tagger.py:62-96,121-142):
    weighted \\b-bounded match counts per topic, top-N >= min_score with
    ties broken by topic DICT-INSERTION order (Python's stable sort), and
    an 'unclassified' row (score 0.0) for documents matching nothing.
    Returns (id, topic, score) rows. Native plan: one regexp_count
    projection per keyword, stack to long form, window top-N, anti-join
    fallback — no UDF."""
    topics = topics or TOPICS
    lo = F.lower(F.col(text_col))
    scored = df.select(
        F.col(id_col),
        *[topic_score_col(lo, kws).alias(f"_t_{i}")
          for i, kws in enumerate(topics.values())])
    stack_expr = ", ".join(
        f"'{name}', {i}, _t_{i}" for i, name in enumerate(topics))
    long = scored.selectExpr(
        id_col, f"stack({len(topics)}, {stack_expr}) as (topic, tidx, score)")
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("tidx"))
    tagged = (long.where(F.col("score") >= min_score)
              .withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") <= top_n)
              .select(id_col, "topic", F.round("score", 6).alias("score")))
    unclassified = (df.select(F.col(id_col))
                    .join(tagged.select(id_col), id_col, "left_anti")
                    .select(F.col(id_col), F.lit("unclassified").alias("topic"),
                            F.lit(0.0).alias("score")))
    return tagged.unionByName(unclassified)


def quality_filter(df: DataFrame, text_col: str,
                   min_words: int = MIN_WORDS_QUALITY,
                   min_chars: int = MIN_CHARS_QUALITY) -> DataFrame:
    """Simple two-reason quality gate (word/char floors) used by the
    lifecycle composite; the full reference-fidelity filter is
    `quality_reason_col` below."""
    wc = word_count_col(F.col(text_col))
    return df.withColumn(
        "reason",
        F.when(wc < min_words, "too_few_words")
         .when(F.length(F.col(text_col)) < min_chars, "too_short")
         .otherwise("kept"))


# --- full reference-fidelity quality filter (SURVEY P6) ------------------
# reference processors/quality_filter.py:17-20,67-138

MAX_CODE_RATIO = 0.85
TOPIC_EXEMPT_TYPES = ["benchmark", "release"]  # BENCHMARK, GITHUB_RELEASE
DOCS_TYPE = "docs"  # OFFICIAL_DOCS analog: the only type code-ratio-checked
BOILERPLATE_PHRASES = [
    "skip to content", "table of contents", "cookie policy",
    "privacy policy", "terms of service", "subscribe to newsletter",
]
BOILER_MIN_PHRASES = 3
BOILER_SHORT_WORDS = 50
BOILER_LINK_RATIO = 0.3
CODE_FENCE_RX = r"```[\s\S]*?```"


def code_ratio_col(text: Column) -> Column:
    """reference quality_filter.py:97-108: fenced-code chars / total chars."""
    code_chars = F.aggregate(
        F.regexp_extract_all(text, F.lit(CODE_FENCE_RX), 0),
        F.lit(0), lambda acc, x: acc + F.length(x))
    return (code_chars.cast("double")
            / F.greatest(F.length(text).cast("double"), F.lit(1.0)))


def is_boilerplate_col(text: Column) -> Column:
    """reference quality_filter.py:110-138: >=3 known chrome phrases, OR a
    short text whose words are >30% links (http/ or /path)."""
    phrase_hits = contains_count_col(F.lower(text), BOILERPLATE_PHRASES)
    words = F.split(F.trim(text), r"\s+")
    wc = F.size(words).cast("double")
    link_words = F.size(F.filter(
        words, lambda w: w.startswith("http") | w.startswith("/")))
    return ((phrase_hits >= F.lit(BOILER_MIN_PHRASES))
            | ((wc < F.lit(float(BOILER_SHORT_WORDS)))
               & (link_words.cast("double") > wc * F.lit(BOILER_LINK_RATIO))))


def quality_reason_col(text: Column, source_type: Column,
                       has_topics: Column,
                       min_words: int = MIN_WORDS_QUALITY) -> Column:
    """SURVEY P6 at reference fidelity (quality_filter.py:67-95): first
    failing reason wins in reference order — word floor, topic requirement
    (benchmark/release exempt), code-ratio (docs only), boilerplate.
    `has_topics` is the tagger verdict (any topic score >= threshold)."""
    wc = word_count_col(text)
    exempt = source_type.isin(TOPIC_EXEMPT_TYPES)
    return (F.when(wc < min_words, "too_short")
            .when(~exempt & ~has_topics, "no_topics")
            .when((source_type == DOCS_TYPE)
                  & (code_ratio_col(text) > MAX_CODE_RATIO), "mostly_code")
            .when(is_boilerplate_col(text), "boilerplate")
            .otherwise("kept"))


def has_topics_col(text: Column,
                   topics: dict[str, list[str]] | None = None,
                   min_score: float = TOPIC_MIN_SCORE) -> Column:
    """Whether the tagger would classify this text (any topic score >=
    min_score) — i.e. topics != ['unclassified'] without the top-N window."""
    topics = topics or TOPICS
    lo = F.lower(text)
    best = F.greatest(*[topic_score_col(lo, kws) for kws in topics.values()])
    return best >= F.lit(min_score)


def lang_id_col(text: Column) -> Column:
    """Language-ID heuristic: argmax stopword hits (ties -> lexicographic
    smallest lang), 'unknown' when nothing matches."""
    lo = F.lower(text)
    scores = [(lang, contains_count_col(lo, words))
              for lang, words in sorted(LANG_STOPWORDS.items())]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("unknown")
    for lang, s in reversed(scores):  # earlier langs win ties
        out = F.when((s == best) & (best > 0), lang).otherwise(out)
    return out


def token_count_col(text: Column) -> Column:
    """BPE-ish token proxy: count of letter-runs, digit-runs, punct marks."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def fingerprint_col(text: Column) -> Column:
    """Deterministic document fingerprint (md5 of lowercased text)."""
    return F.md5(F.lower(text))


def quality_score_col(text: Column) -> Column:
    """Composite quality score in [0,1]: word-count saturation, stopword
    presence, punctuation ratio (training-data-pipeline heuristic)."""
    wc = word_count_col(text).cast("double")
    stop = contains_count_col(F.lower(text), LANG_STOPWORDS["en"]).cast("double")
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0)).cast("double")
    punct_ratio = n_punct / F.greatest(F.length(text).cast("double"), F.lit(1.0))
    return F.round(
        F.least(wc / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop / F.lit(3.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2, 6)


def extract_year_col(text: Column) -> Column:
    """SURVEY P4 analog: first 4-digit year in the leading 500 chars."""
    return F.regexp_extract(F.substring(text, 1, 500), r"((19|20)[0-9]{2})", 1)


def record_id_col(origin: Column, source_type: Column, key: Column) -> Column:
    """SURVEY C11: deterministic record id
    `{origin}-{source_type}-{sha256(key)[:12]}`
    (reference scrapers/utils.py:249-252). Native sha2 — no UDF."""
    return F.concat_ws("-", origin, source_type,
                       F.substring(F.sha2(key, 256), 1, 12))


# P4 date formats, tried in order (reference scrapers/utils.py:260-276 tries
# three regex formats over the first 500 chars then dateutil-parses).
# (regex to locate, spark to_date pattern) pairs; the DuckDB oracle uses the
# equivalent strptime formats.
DATE_PATTERNS: list[tuple[str, str]] = [
    (r"([0-9]{4}-[0-9]{2}-[0-9]{2})", "yyyy-MM-dd"),
    (r"([0-9]{2}/[0-9]{2}/[0-9]{4})", "MM/dd/yyyy"),
    (r"([A-Z][a-z]{2} [0-9]{2}, [0-9]{4})", "MMM dd, yyyy"),
]


def extract_date_col(text: Column) -> Column:
    """SURVEY P4: first parseable date in the leading 500 chars, trying the
    three reference formats in order; NULL when none matches."""
    head = F.substring(text, 1, 500)
    candidates = [
        F.to_date(F.nullif(F.regexp_extract(head, rx, 1), F.lit("")), fmt)
        for rx, fmt in DATE_PATTERNS]
    return F.coalesce(*candidates)


# P14 benchmark-mining units (reference scrapers/benchmark_scraper.py:161-209
# regex-mines rows/s, ms, GB/s, QPS, x-faster figures out of prose).
METRIC_UNITS = ["rows/s", "GB/s", "QPS", "ms"]
METRIC_RX = (r"([0-9]+(?:\.[0-9]+)?)\s*(" + "|".join(METRIC_UNITS) + r")")


def mine_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """SURVEY P14: regex-mine (value, unit) performance figures into long
    format — regexp_extract_all + posexplode, all native."""
    pairs = F.arrays_zip(
        F.regexp_extract_all(F.col(text_col), F.lit(METRIC_RX), 1),
        F.regexp_extract_all(F.col(text_col), F.lit(METRIC_RX), 2))
    return (df.select(F.col(id_col), F.posexplode(pairs).alias("pos", "m"))
            .select(id_col, "pos",
                    F.col("m.0").cast("double").alias("metric_value"),
                    F.col("m.1").alias("unit")))


# P2 boilerplate strip patterns (reference processors/content_extractor.py:
# 22-67 strips cookie banners, newsletter CTAs, social chrome, copyright
# footers, then normalizes whitespace)
BOILERPLATE_PATTERNS = [
    r"(?i)accept (all )?cookies[^.!?]*[.!?]",
    r"(?i)subscribe to our newsletter[^.!?]*[.!?]",
    r"(?i)follow us on [a-z]+",
    r"©\s*[0-9]{4}[^\n]*",
]


def clean_boilerplate_col(text: Column) -> Column:
    """SURVEY P2: chained native regexp_replace passes + whitespace
    normalization. Stays inside whole-stage codegen; the fence-preserving
    variant of the reference lives in the recursive chunker's UDF."""
    c = text
    for p in BOILERPLATE_PATTERNS:
        c = F.regexp_replace(c, p, " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))
