"""SURVEY R5 — query analysis, the deterministic layers, Spark-native.

The reference's ``_analyze_query`` (webapp/rag/query_engine.py:858-884) is
one LLM chat call wrapped in two fully deterministic layers; both are
implemented here with native Spark SQL expressions (no UDFs):

1. **JSON repair + fallback** (query_engine.py:867-884): strip markdown
   code fences exactly as the reference does (``startswith('```')`` ->
   drop the first line, or the first 3 chars when there is no newline;
   ``endswith('```')`` -> drop the trailing fence; trim), parse against
   the analysis schema, and fall back to the documented default analysis
   (``intent='exploratory'``, ``sub_queries=[query]``,
   ``reasoning='Analysis failed, using original query'``) when the
   payload is unparseable.  Parse failure is detected via Spark's
   ``columnNameOfCorruptRecord`` (non-object / malformed payloads are
   failures, matching ``json.loads`` + dict-use semantics).

2. **Rule-based analyzer** for the no-LLM path, following the analysis
   prompt's own taxonomy (webapp/rag/prompts.py:11-35): word-bounded
   competitor short-name mentions, intent classification
   (comparison / factual / objection_handling / exploratory),
   word-bounded topic mentions against the engine's topic keyword table,
   and a source-type hint.  The LLM call itself stays out of engine
   scope (SURVEY §2.5); these rules are the deterministic stand-in, the
   same stance as ``hash_embed`` for V9.

Scale note: every expression here is a scalar projection — no shuffle,
no UDF, fully inside whole-stage codegen; at 100 TB this is a map-only
stage fused into whatever scan feeds it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ai_intel_web_scraper_spark.operators.text import TOPICS

# Prompt taxonomy (webapp/rag/prompts.py:29): competitor short names the
# analyzer may emit; mention detection is \b-bounded, case-insensitive.
COMPETITORS: list[str] = ["kx", "questdb", "clickhouse"]

# Intent rules (deterministic stand-in for the LLM's
# "comparison|factual|objection_handling|exploratory" choice,
# prompts.py:20).  First match wins, in this order; >=2 competitor
# mentions also force 'comparison'.
INTENT_COMPARISON_RE = (
    r"\b(vs|versus|compare|compared|comparison|better|faster|differ|"
    r"difference)\b")
INTENT_OBJECTION_RE = (
    r"\b(objection|concern|concerned|worried|pushback|claims?|skeptical|"
    r"doubts?)\b")
INTENT_FACTUAL_RE = (
    r"^(what|when|where|which|who|how (much|many)|does|do|is|are|can)\b")

# Source-type hints (prompts.py:26): first matching rule wins.
HINT_RULES: list[tuple[str, str]] = [
    ("benchmark", r"\b(benchmark|benchmarks|throughput|latency|qps)\b"),
    ("official_docs", r"\b(syntax|api|configure|install|docs|documentation)\b"),
    ("blog", r"\b(announcement|release|roadmap|blog)\b"),
]

FALLBACK_INTENT = "exploratory"
FALLBACK_REASONING = "Analysis failed, using original query"

# The LLM response schema (prompts.py:19-27) + the corrupt-record column
# used to detect parse failure.
_CORRUPT = "_corrupt"
ANALYSIS_SCHEMA = T.StructType([
    T.StructField("intent", T.StringType()),
    T.StructField("competitors_mentioned", T.ArrayType(T.StringType())),
    T.StructField("topics", T.ArrayType(T.StringType())),
    T.StructField("sub_queries", T.ArrayType(T.StringType())),
    T.StructField("hyde_passage", T.StringType()),
    T.StructField("source_type_hints", T.ArrayType(T.StringType())),
    T.StructField("reasoning", T.StringType()),
    T.StructField(_CORRUPT, T.StringType()),
])


# Python str.strip() analog: SQL trim() strips only spaces (both Spark
# and DuckDB), but the reference strips all whitespace incl. newlines.
_WS_EDGE_RE = r"^\s+|\s+$"


def pystrip_col(c: Column) -> Column:
    return F.regexp_replace(c, _WS_EDGE_RE, "")


def strip_md_fences_col(raw: Column) -> Column:
    """Reference fence repair, expression-for-expression
    (query_engine.py:867-872): strip; if the payload starts with ``` drop
    through the first newline (or just the 3 backticks when single-line);
    if it then ends with ``` drop the trailing fence; strip again."""
    c = pystrip_col(raw)
    nl = F.instr(c, "\n")
    defenced = F.when(
        c.startswith("```"),
        F.when(nl > 0, F.substr(c, nl + F.lit(1)))
         .otherwise(F.substr(c, F.lit(4)))).otherwise(c)
    # endswith('```') => rsplit('```', 1)[0] == payload minus last 3 chars
    untailed = F.when(
        defenced.endswith("```"),
        F.substr(defenced, F.lit(1), F.length(defenced) - 3)
    ).otherwise(defenced)
    return pystrip_col(untailed)


def parse_analysis_col(raw: Column) -> Column:
    """``json.loads`` analog: cleaned payload -> analysis struct with a
    ``_corrupt`` field that is non-null exactly when the reference's
    ``json.loads`` path would raise (malformed or non-object JSON)."""
    return F.from_json(strip_md_fences_col(raw), ANALYSIS_SCHEMA,
                       {"columnNameOfCorruptRecord": _CORRUPT})


def analysis_failed_col(parsed: Column) -> Column:
    """True when the reference would take the fallback branch
    (query_engine.py:875-884)."""
    return parsed.isNull() | parsed[_CORRUPT].isNotNull()


def _csv_or_null_marker(arr: Column) -> Column:
    """Array -> '|'-joined CSV with NULL encoded as a marker so the
    value-hash can distinguish NULL from [] (DuckDB's array_to_string
    folds both to NULL otherwise)."""
    return F.when(arr.isNull(), F.lit("<null>")).otherwise(
        F.array_join(arr, "|"))


def repaired_analysis_cols(raw: Column, query: Column) -> list[Column]:
    """Layer 1 flattened: the parsed-or-fallback analysis as scalar
    columns (CSV-joined arrays), exactly the dict `_analyze_query`
    returns on each path."""
    parsed = parse_analysis_col(raw)
    failed = analysis_failed_col(parsed)
    return [
        failed.alias("parse_failed"),
        F.when(failed, F.lit(FALLBACK_INTENT))
         .otherwise(parsed["intent"]).alias("llm_intent"),
        F.when(failed, F.lit("")).otherwise(
            _csv_or_null_marker(parsed["competitors_mentioned"]))
         .alias("llm_competitors"),
        F.when(failed, query)
         .otherwise(_csv_or_null_marker(parsed["sub_queries"]))
         .alias("llm_sub_queries"),
        F.when(failed, F.lit("<null>"))
         .otherwise(F.coalesce(parsed["hyde_passage"], F.lit("<null>")))
         .alias("llm_hyde"),
        F.when(failed, F.lit(FALLBACK_REASONING))
         .otherwise(parsed["reasoning"]).alias("llm_reasoning"),
    ]


def _mention_csv(lo: Column, names: list[str],
                 patterns: dict[str, str] | None = None) -> Column:
    """CSV of `names` whose \\b-bounded pattern matches (concat_ws skips
    the NULLs of non-matches, preserving list order)."""
    pats = patterns or {n: rf"\b{n}\b" for n in names}
    return F.concat_ws(
        ",", *[F.when(lo.rlike(pats[n]), F.lit(n)) for n in names])


def rule_analysis_cols(query: Column) -> list[Column]:
    """Layer 2: the deterministic analyzer over the raw user query."""
    lo = F.lower(query)
    n_comp = sum((lo.rlike(rf"\b{c}\b").cast("int") for c in COMPETITORS),
                 F.lit(0))
    intent = (
        F.when(lo.rlike(INTENT_COMPARISON_RE) | (n_comp >= 2),
               F.lit("comparison"))
        .when(lo.rlike(INTENT_OBJECTION_RE), F.lit("objection_handling"))
        .when(lo.rlike(INTENT_FACTUAL_RE), F.lit("factual"))
        .otherwise(F.lit(FALLBACK_INTENT)))
    topic_pats = {t: r"\b(" + "|".join(kws) + r")\b"
                  for t, kws in TOPICS.items()}
    hint = F.lit(None).cast("string")
    for name, pat in reversed(HINT_RULES):
        hint = F.when(lo.rlike(pat), F.lit(name)).otherwise(hint)
    return [
        intent.alias("rule_intent"),
        _mention_csv(lo, COMPETITORS).alias("rule_competitors"),
        _mention_csv(lo, list(TOPICS), topic_pats).alias("rule_topics"),
        F.coalesce(hint, F.lit("<null>")).alias("rule_hint"),
    ]
