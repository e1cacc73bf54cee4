"""Community sources: Reddit search and HN Algolia shapes (SURVEY S5/S6)
plus the community sentiment estimator (P13) at reference fidelity.

Reference semantics reproduced declaratively:
- Reddit (scrapers/community_scraper.py:64-176): global search waves then
  per-subreddit waves, order-sensitive keep-first URL dedup across waves,
  record build ('# title\\n\\nselftext', word floor 10, sentiment over
  title+selftext, utc->date), 429 -> sleep-60 backoff (the deadline-column
  requeue here).
- HN (community_scraper.py:178-292): keep-first on objectID, HN discussion
  URL as canonical, CONDITIONAL child fetch — comments join only for
  points > 5 (a filtered join, never a per-row call) — HTML-tag strip,
  '**author**: text' formatting, top-5 '---'-separated assembly.
- Sentiment (community_scraper.py:294-319): 17 negative / 12 positive
  substring signals with the +1-margin 4-way rule.

Everything is native Column expressions — the fetch itself is a table
(search results / items), as the engine's source contract requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.text import record_id_col

# reference community_scraper.py:298-308
NEGATIVE_SIGNALS = [
    "problem", "issue", "bug", "broken", "crash", "slow",
    "limitation", "missing", "doesn't support", "can't",
    "disappointing", "frustrating", "worse", "awful",
    "not production", "not ready", "unstable",
]
POSITIVE_SIGNALS = [
    "fast", "great", "excellent", "love", "amazing",
    "impressed", "recommend", "solid", "reliable",
    "production ready", "best", "performant",
]
MIN_POST_WORDS = 10        # community_scraper.py:148
HN_POINTS_FLOOR = 5        # community_scraper.py:242 (fetch comments if >)
HN_TOP_COMMENTS = 5        # community_scraper.py:247
HN_MAX_COMMENTS = 10       # community_scraper.py:274
RATE_LIMIT_BACKOFF_S = 60.0  # community_scraper.py:130-133 (429 -> 60 s)


def _signal_count(text_lower: Column, signals: list[str]) -> Column:
    c = F.lit(0)
    for s in signals:
        c = c + F.when(text_lower.contains(s), 1).otherwise(0)
    return c


def community_sentiment_col(text: Column) -> Column:
    """P13 at reference fidelity (community_scraper.py:294-319): the
    margin rule — negative iff neg > pos+1, positive iff pos > neg+1,
    mixed iff both sides scored, else neutral."""
    lo = F.lower(text)
    neg = _signal_count(lo, NEGATIVE_SIGNALS)
    pos = _signal_count(lo, POSITIVE_SIGNALS)
    return (F.when(neg > pos + 1, "negative")
            .when(pos > neg + 1, "positive")
            .when((neg > 0) & (pos > 0), "mixed")
            .otherwise("neutral"))


def _utc_date_str(created_utc: Column) -> Column:
    """utcfromtimestamp(ts).date() as a canonicalization-proof string
    (pure day arithmetic — no session-timezone dependence)."""
    days = F.floor(created_utc / F.lit(86400.0)).cast("int")
    return F.when(
        created_utc > 0,
        F.date_format(F.date_add(F.to_date(F.lit("1970-01-01")), days),
                      "yyyy-MM-dd"))


def reddit_records(posts: DataFrame, origin: str,
                   query_seq_col: str = "query_seq") -> DataFrame:
    """S5: Reddit search results -> SourceRecord rows.

    `posts` carries one row per (search wave, post) with a wave-order
    column: the reference iterates global terms then per-subreddit terms,
    skipping URLs already seen (community_scraper.py:70-104) — here the
    keep-first window over the canonical URL.
    Expected columns: permalink, title, selftext, subreddit, score,
    num_comments, author, created_utc, query_seq."""
    from pyspark.sql import Window
    url = F.concat(F.lit("https://www.reddit.com"), F.col("permalink"))
    w = Window.partitionBy("url").orderBy(F.col(query_seq_col).asc())
    first = (posts.withColumn("url", url)
             .withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1).drop("_rn"))
    text = F.when(F.length(F.col("selftext")) > 0,
                  F.concat(F.lit("# "), F.col("title"), F.lit("\n\n"),
                           F.col("selftext"))
                  ).otherwise(F.concat(F.lit("# "), F.col("title")))
    rec = (first.withColumn("text", text)
           .withColumn("word_count",
                       F.size(F.split(F.trim("text"), r"\s+")).cast("int"))
           .where(F.col("word_count") >= MIN_POST_WORDS))
    return rec.select(
        record_id_col(F.lit(origin), F.lit("community_reddit"),
                      F.col("url")).alias("id"),
        F.lit(origin).alias("origin"),
        F.lit("community_reddit").alias("source_type"),
        "url", "title", "text",
        _utc_date_str(F.col("created_utc")).alias("content_date"),
        F.lit("community").alias("credibility"),
        community_sentiment_col(
            F.concat_ws(" ", "title", "selftext")).alias("sentiment"),
        "word_count", "subreddit", "score", "num_comments", "author")


def hn_records(hits: DataFrame, comments: DataFrame, origin: str,
               query_seq_col: str = "query_seq") -> DataFrame:
    """S6: HN Algolia hits + items -> SourceRecord rows. The comment fetch
    is CONDITIONAL on points > 5 (community_scraper.py:239-243): expressed
    as a left join whose comment payload is masked below the floor — no
    per-story calls, one filtered join.

    `hits`: objectID, title, url (story url, may be ''), points,
    num_comments, author, query_seq. `comments`: story_id, comment_seq,
    author, text (raw HTML)."""
    from pyspark.sql import Window
    w = Window.partitionBy("objectID").orderBy(F.col(query_seq_col).asc())
    first = (hits.withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1).drop("_rn"))
    # per-story ordered comment assembly: fetch cap, HTML strip,
    # '**author**: text' (community_scraper.py:274-290)
    cleaned = F.trim(F.regexp_replace("text", r"<[^>]+>", " "))
    per_story = (comments
                 .withColumn("_c", F.concat(F.lit("**"), F.col("author"),
                                            F.lit("**: "), cleaned))
                 .where(F.length(F.trim("text")) > 0)
                 .groupBy("story_id")
                 .agg(F.slice(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col("comment_seq").alias("q"),
                                      F.col("_c").alias("c")))),
                         lambda x: x["c"]),
                     1, HN_MAX_COMMENTS).alias("_fetched")))
    joined = first.join(per_story,
                        first["objectID"] == per_story["story_id"], "left")
    top = F.when((F.col("points") > HN_POINTS_FLOOR)
                 & F.col("_fetched").isNotNull(),
                 F.slice("_fetched", 1, HN_TOP_COMMENTS)
                 ).otherwise(F.array().cast("array<string>"))
    hn_url = F.concat(F.lit("https://news.ycombinator.com/item?id="),
                      F.col("objectID"))
    text = F.concat(
        F.lit("# "), F.col("title"),
        F.lit("\n\nHN Discussion: "), hn_url,
        F.when(F.length(F.col("url")) > 0,
               F.concat(F.lit("\nOriginal URL: "), F.col("url")))
        .otherwise(F.lit("")),
        F.when(F.size(top) > 0,
               F.concat(F.lit("\n\n## Top Comments\n\n"),
                        F.array_join(top, "\n\n---\n\n")))
        .otherwise(F.lit("")))
    out = (joined.withColumn("_top", top)
           .withColumn("text", text)
           .withColumn("word_count",
                       F.size(F.split(F.trim("text"), r"\s+")).cast("int")))
    return out.select(
        record_id_col(F.lit(origin), F.lit("community_hn"),
                      hn_url).alias("id"),
        F.lit(origin).alias("origin"),
        F.lit("community_hn").alias("source_type"),
        hn_url.alias("url"), "title", "text",
        F.lit("community").alias("credibility"),
        community_sentiment_col(
            F.concat(F.col("title"), F.lit(" "),
                     F.array_join("_top", " "))).alias("sentiment"),
        "word_count", "points",
        F.size("_top").alias("n_top_comments"))


def backoff_requeue(queries: DataFrame, status_col: str = "status",
                    deadline_col: str = "deadline",
                    attempt_col: str = "attempt",
                    backoff_s: float = RATE_LIMIT_BACKOFF_S) -> DataFrame:
    """S5's 429 handling as data, not control flow: rate-limited queries
    re-enter the queue with deadline += backoff and attempt+1 (the
    reference sleeps 60 s inline, community_scraper.py:130-133 — a
    distributed engine instead defers the row to a later scheduling wave).
    Returns the next queue state; non-429 rows are done and drop out."""
    return (queries.where(F.col(status_col) == 429)
            .withColumn(deadline_col,
                        F.col(deadline_col) + F.lit(float(backoff_s)))
            .withColumn(attempt_col, F.col(attempt_col) + 1))
