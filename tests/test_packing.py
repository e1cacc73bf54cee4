"""Dataset-assembly operators (`operators/packing.py`): shard packing
invariants, the two-level-prefix-sum ≡ single-window identity, and the
deterministic mixture sampler's rate/threshold contract."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from ai_intel_web_scraper_spark.operators import packing as PK


def _py_key(seed: str, value) -> int:
    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:15], 16)


def test_shuffle_key_matches_python_md5(spark):
    df = spark.createDataFrame([(i,) for i in (0, 1, 7, 123456789)],
                               "doc_id long")
    got = {r["doc_id"]: r["k"] for r in df.select(
        "doc_id",
        PK.shuffle_key_col(F.col("doc_id"), "s").alias("k")).collect()}
    for i, k in got.items():
        assert k == _py_key("s", i)
        assert 0 <= k < 1 << PK.KEY_BITS


@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = PK.pack_shards(docs, "doc_id", "text", budget=256).collect()
    # sort key includes the shuffle key so zero-token docs (which tie on
    # start_offset with their successor) order deterministically
    return sorted(rows, key=lambda r: (r["start_offset"],
                                       _py_key(PK.PACK_SEED, r["doc_id"]),
                                       r["doc_id"]))


def test_pack_offsets_contiguous_in_key_order(packed):
    # Concat-and-split: sorted by start_offset, each document begins
    # exactly where the previous one ended, starting at 0 — and that
    # order IS the seeded key order.
    assert packed[0]["start_offset"] == 0
    off = 0
    for r in packed:
        assert r["start_offset"] == off
        off += r["n_tokens"]
    keys = [(_py_key(PK.PACK_SEED, r["doc_id"]), r["doc_id"]) for r in packed]
    assert keys == sorted(keys)


def test_pack_shard_geometry(packed):
    for r in packed:
        assert r["shard_id"] == r["start_offset"] // 256
        assert r["offset_in_shard"] == r["start_offset"] % 256
        end = max(r["start_offset"] + r["n_tokens"] - 1, r["start_offset"])
        assert r["n_spans"] == end // 256 - r["shard_id"] + 1
        assert r["n_spans"] >= 1
    # the budget is small enough that some docs must straddle a boundary
    assert any(r["n_spans"] > 1 for r in packed)


def test_pack_two_level_equals_single_bucket(spark, sf_dir):
    # The distributed shape (many ordered key-range buckets + bucket
    # prefix) must be value-identical to the degenerate single-bucket
    # run, which IS the plain global window definition.
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    many = PK.pack_shards(docs, "doc_id", "text", n_buckets=13)
    one = PK.pack_shards(docs, "doc_id", "text", n_buckets=1)
    assert many.exceptAll(one).isEmpty() and one.exceptAll(many).isEmpty()


def test_shard_spans_conservation_and_geometry(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    packed = PK.pack_shards(docs, "doc_id", "text", budget=256)
    spans = PK.shard_spans(packed, "doc_id", budget=256).collect()
    by_doc, by_shard = {}, {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_shard[r["shard_id"]] = (by_shard.get(r["shard_id"], 0)
                                   + r["span_tokens"])
    pk = {r["doc_id"]: r for r in packed.collect()}
    assert set(by_doc) == set(pk)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["span_index"])
        # per-doc conservation + contiguous span indexes from 0
        assert sum(r["span_tokens"] for r in rs) == pk[doc_id]["n_tokens"]
        assert [r["span_index"] for r in rs] == list(range(len(rs)))
        assert rs[0]["shard_id"] == pk[doc_id]["shard_id"]
        assert rs[0]["span_start_in_shard"] == pk[doc_id]["offset_in_shard"]
        # non-first spans start at the shard head
        assert all(r["span_start_in_shard"] == 0 for r in rs[1:])
    # every shard except the last is filled to exactly the budget
    last = max(by_shard)
    assert all(n == 256 for s, n in by_shard.items() if s != last)
    assert 0 < by_shard[last] <= 256
    # the small budget forces real multi-span docs
    assert any(len(rs) > 1 for rs in by_doc.values())


def test_shard_spans_budget_independent_of_packed_geometry(spark):
    # shard_spans re-derives the geometry from (start_offset, n_tokens)
    # under ITS budget — it must not read the packed frame's shard_id /
    # offset_in_shard / n_spans columns, so a caller re-slicing the same
    # packing under a different budget gets the correct new manifest.
    docs = spark.createDataFrame(
        [(i, "tok " * (40 * (i + 1))) for i in range(6)],
        "doc_id long, text string")
    packed = PK.pack_shards(docs, "doc_id", "text", budget=256)
    resliced = {(r["doc_id"], r["span_index"]): r
                for r in PK.shard_spans(packed, "doc_id",
                                        budget=64).collect()}
    direct = {(r["doc_id"], r["span_index"]): r
              for r in PK.shard_spans(
                  PK.pack_shards(docs, "doc_id", "text", budget=64),
                  "doc_id", budget=64).collect()}
    assert resliced.keys() == direct.keys()
    for k, r in resliced.items():
        for c in ("shard_id", "span_start_in_shard", "span_tokens"):
            assert r[c] == direct[k][c], (k, c)
        assert r["span_tokens"] >= 0


def test_pack_property_based_vs_python_oracle(spark):
    """Property test: on arbitrary token-count multisets — including
    adversarial runs of zero-token docs and budget-straddling giants —
    the distributed packing equals a 10-line Python oracle that sorts by
    the seeded key and runs one cumulative sum."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=700),
                    min_size=1, max_size=60),
           st.sampled_from([1, 7, 256]))
    def check(counts, budget):
        # doc text with exactly `c` tokens under the repo token regex
        docs = spark.createDataFrame(
            [(i, "t " * c) for i, c in enumerate(counts)],
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in PK.pack_shards(
            docs, "doc_id", "text", budget=budget, n_buckets=5).collect()}
        order = sorted(range(len(counts)),
                       key=lambda i: (_py_key(PK.PACK_SEED, i), i))
        off = 0
        for i in order:
            r = got[i]
            assert r["n_tokens"] == counts[i]
            assert r["start_offset"] == off
            assert r["shard_id"] == off // budget
            assert r["offset_in_shard"] == off % budget
            end = max(off + counts[i] - 1, off)
            assert r["n_spans"] == end // budget - off // budget + 1
            off += counts[i]

    check()


def test_pack_curriculum_strata_major_shuffled_within(spark):
    # Strata-major: every stratum-0 token packs before any stratum-1
    # token; within a stratum the order is the seeded key order (not
    # doc_id order). Offsets stay globally contiguous across the strata
    # boundary — one stream, not three.
    docs = spark.createDataFrame(
        [(i, "t " * c) for i, c in enumerate(
            [300, 10, 80, 250, 5, 60, 220, 75, 12])],
        "doc_id long, text string")
    counts = {i: c for i, c in enumerate([300, 10, 80, 250, 5, 60, 220, 75, 12])}
    strat = {i: 0 if c >= PK.CURR_BANDS[0] else 1 if c >= PK.CURR_BANDS[1]
             else 2 for i, c in counts.items()}
    docs = docs.withColumn(
        "st", PK.curriculum_stratum_col(
            F.length(F.col("text")) / 2))  # "t " pairs -> exact count
    rows = PK.pack_shards(docs, "doc_id", "text", budget=128,
                          strata_col="st", n_strata=3, n_buckets=5).collect()
    order = sorted(rows, key=lambda r: r["start_offset"])
    # contiguous from 0
    off = 0
    for r in order:
        assert r["start_offset"] == off
        off += r["n_tokens"]
    # strata-major, key order within
    seen = [(strat[r["doc_id"]],
             _py_key(PK.PACK_SEED, r["doc_id"]), r["doc_id"])
            for r in order]
    assert seen == sorted(seen)
    # within-stratum order differs from doc_id order for some stratum
    # (sanity: the seeded shuffle did something)
    by_strat = {}
    for s, _, i in seen:
        by_strat.setdefault(s, []).append(i)
    assert any(ids != sorted(ids) for ids in by_strat.values())


def test_pack_curriculum_two_level_equals_single_bucket(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    from ai_intel_web_scraper_spark.operators.text import token_count_col
    docs = docs.withColumn(
        "st", PK.curriculum_stratum_col(token_count_col(F.col("text"))
                                        .cast("long")))
    many = PK.pack_shards(docs, "doc_id", "text", n_buckets=13,
                          strata_col="st", n_strata=3)
    one = PK.pack_shards(docs, "doc_id", "text", n_buckets=1,
                         strata_col="st", n_strata=3)
    assert many.exceptAll(one).isEmpty() and one.exceptAll(many).isEmpty()


def test_pack_n_strata_bounds(spark):
    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with pytest.raises(ValueError):
        PK.pack_shards(docs, "doc_id", "text", n_strata=8)
    with pytest.raises(ValueError):
        PK.pack_shards(docs, "doc_id", "text", n_strata=0)


def test_mixture_rates_token_weighted(spark):
    # Two sources, equal weights, but source a holds 9x the token mass in
    # 1/3 the documents: token weighting must set n_before to token mass
    # and cut a's rate accordingly while the keep decision stays per-doc.
    rows = ([(f"a-{i}", "a", 900) for i in range(2)]
            + [(f"b-{i}", "b", 33) for i in range(6)])
    docs = spark.createDataFrame(rows,
                                 "doc_id string, source string, nt long")
    rates = {r["source"]: r for r in PK.mixture_rates(
        docs, "source", weights={"a": 1, "b": 1},
        tokens_col="nt").collect()}
    total = 2 * 900 + 6 * 33
    assert rates["a"]["n_before"] == 1800
    assert rates["b"]["n_before"] == 198
    assert rates["a"]["rate"] == pytest.approx(
        (PK.MIX_FRAC_NUM * 1 * total) / (2 * PK.MIX_FRAC_DEN * 1800), abs=0)
    assert rates["b"]["rate"] == 1.0  # scarce source capped
    got = PK.mixture_sample(docs, "doc_id", "source",
                            weights={"a": 1, "b": 1},
                            tokens_col="nt").collect()
    for r in got:
        u = _py_key(PK.MIX_SEED, r["doc_id"]) / float(1 << PK.KEY_BITS)
        assert r["kept"] == (u < rates[r["source"]]["rate"])


def test_mixture_rates_formula_and_cap(spark):
    # 3 sources, weights {a:1, b:2} (c unweighted -> dropped); frac 3/5.
    rows = [(f"d{i}", src) for src, n in (("a", 8), ("b", 2), ("c", 5))
            for i in range(n)]
    docs = spark.createDataFrame(
        [(f"{s}-{j}", s) for j, (_, s) in enumerate(rows)],
        "doc_id string, source string")
    rates = {r["source"]: r for r in PK.mixture_rates(
        docs, "source", weights={"a": 1, "b": 2}).collect()}
    assert set(rates) == {"a", "b"}
    # rate_a = min(1, (3*1*15)/(3*5*8)) = 45/120; rate_b = 90/30 -> capped
    assert rates["a"]["rate"] == pytest.approx(45 / 120, abs=0)
    assert rates["b"]["rate"] == 1.0


def test_mixture_sample_threshold_matches_python(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = PK.mixture_sample(docs, "doc_id", "source").collect()
    n = len(got)
    counts = {}
    for r in got:
        counts[r["source"]] = counts.get(r["source"], 0) + 1
    for r in got:
        w = PK.MIX_WEIGHTS[r["source"]]
        rate = min(1.0, (PK.MIX_FRAC_NUM * w * n)
                   / (PK.MIX_WEIGHT_DEN * PK.MIX_FRAC_DEN
                      * counts[r["source"]]))
        u = _py_key(PK.MIX_SEED, r["doc_id"]) / float(1 << PK.KEY_BITS)
        assert r["kept"] == (u < rate), r["doc_id"]
    # weights differ across sources, so both outcomes must occur
    kept = sum(1 for r in got if r["kept"])
    assert 0 < kept < n


def test_stratified_sample_is_uniform_per_stratum_and_stable(spark, sf_dir):
    import os
    from ai_intel_web_scraper_spark.operators import packing as PK
    from pyspark.sql import functions as F
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    s = PK.stratified_sample(docs, ["source"], k=5, id_col="doc_id")
    got = s.groupBy("source").agg(F.count("*").alias("n"),
                                  F.max("sample_rank").alias("mx")).collect()
    sizes = {r["source"]: r for r in
             docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for r in got:
        expect = min(5, sizes[r["source"]]["n"])
        assert r["n"] == expect and r["mx"] == expect
    # deterministic: a second evaluation returns the identical id set
    ids1 = {(r["source"], r["doc_id"]) for r in s.collect()}
    ids2 = {(r["source"], r["doc_id"])
            for r in PK.stratified_sample(docs, ["source"], 5,
                                          "doc_id").collect()}
    assert ids1 == ids2
    # a different seed draws a different sample (permutation actually used)
    ids3 = {(r["source"], r["doc_id"])
            for r in PK.stratified_sample(docs, ["source"], 5, "doc_id",
                                          seed="other").collect()}
    assert ids1 != ids3
