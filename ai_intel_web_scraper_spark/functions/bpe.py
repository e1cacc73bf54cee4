"""Real byte-pair-encoding tokenizer — the SURVEY V1 high-fidelity path.

The reference counts tokens with tiktoken's ``cl100k_base`` encoder
(``vectorstore/chunker.py:33-41``).  tiktoken's merges table is not in
this container, so the engine ships the REAL BPE machinery with a
pluggable merges table:

- ``train_bpe(texts, n_merges)`` learns a deterministic merges table
  from a corpus sample (incremental pair-count maintenance — the
  scalable trainer);
- ``encode(text, ranks)`` is the published GPT-2/tiktoken greedy loop:
  pre-tokenize, then repeatedly merge the lowest-rank adjacent byte
  pair.  Drop tiktoken's published cl100k merges list into
  ``build_ranks`` and this encoder IS the reference's tokenizer; the
  trained table is the deterministic stand-in until then (same stance
  as V9's hash_embed).

The pre-tokenizer is the cl100k shape restricted to ASCII classes:
contractions, space-prefixed letter runs, 1-3 digit runs,
space-prefixed punctuation runs, whitespace runs.  It covers every
character, so BPE is lossless: ``b"".join(encode(t)) == t.encode()``
(property-tested).

Scale design: training happens ONCE driver-side over a bounded corpus
sample (pair counting is a stream over word frequencies — at 100 TB you
train on a sample or load the published table; the merges list is a few
KB).  Encoding is an Arrow-batched pandas UDF; the ranks dict enters
each executor once via closure capture, the per-word LRU cache makes
repeated vocabulary nearly free, and no shuffle is introduced.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterable

import pandas as pd

# cl100k-shaped pre-tokenizer over ASCII classes (full coverage: the
# trailing \s+ catches anything the earlier branches skip).
PRETOKEN_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+|\s+")


def pretokenize(text: str) -> list[bytes]:
    return [m.group(0).encode("utf-8") for m in PRETOKEN_RE.finditer(text)]


def _word_pairs(parts: list[bytes]) -> Iterable[tuple[bytes, bytes]]:
    return zip(parts, parts[1:])


def train_bpe(texts: Iterable[str],
              n_merges: int) -> list[tuple[bytes, bytes]]:
    """Learn `n_merges` merges: repeatedly fuse the most frequent
    adjacent pair (ties -> lexicographically smallest pair, so training
    is fully deterministic).  Pair counts are maintained incrementally:
    each merge touches only the words that contain the merged pair."""
    words = Counter()
    for t in texts:
        for w in pretokenize(t):
            words[w] += 1
    # word -> current symbol list; pair -> total count; pair -> words
    parts: dict[bytes, list[bytes]] = {
        w: [bytes([b]) for b in w] for w in words}
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[bytes, bytes], set[bytes]] = {}
    for w, freq in words.items():
        for p in _word_pairs(parts[w]):
            pair_counts[p] += freq
            pair_words.setdefault(p, set()).add(w)
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if (best is None or c > pair_counts[best]
                    or (c == pair_counts[best] and p < best)):
                best = p
        if best is None:
            break
        merges.append(best)
        fused = best[0] + best[1]
        for w in list(pair_words.get(best, ())):
            freq = words[w]
            old = parts[w]
            for p in _word_pairs(old):
                pair_counts[p] -= freq
                s = pair_words.get(p)
                if s is not None:
                    s.discard(w)
            new: list[bytes] = []
            i = 0
            while i < len(old):
                if (i + 1 < len(old)
                        and old[i] == best[0] and old[i + 1] == best[1]):
                    new.append(fused)
                    i += 2
                else:
                    new.append(old[i])
                    i += 1
            parts[w] = new
            for p in _word_pairs(new):
                pair_counts[p] += freq
                pair_words.setdefault(p, set()).add(w)
    return merges


def build_ranks(
        merges: list[tuple[bytes, bytes]]) -> dict[tuple[bytes, bytes], int]:
    """pair -> merge priority (lower = earlier = merged first).  Feed it
    a published merges list (e.g. tiktoken cl100k) for reference
    fidelity."""
    return {p: i for i, p in enumerate(merges)}


def encode_word(word: bytes, ranks: dict[tuple[bytes, bytes], int],
                cache: dict[bytes, list[bytes]] | None = None) -> list[bytes]:
    """GPT-2's greedy merge loop: merge every adjacent occurrence of the
    lowest-rank pair present, repeat until no merge applies."""
    if cache is not None:
        hit = cache.get(word)
        if hit is not None:
            return hit
    parts = [bytes([b]) for b in word]
    while len(parts) > 1:
        best = None
        best_rank = None
        for p in _word_pairs(parts):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        fused = best[0] + best[1]
        new: list[bytes] = []
        i = 0
        while i < len(parts):
            if (i + 1 < len(parts)
                    and parts[i] == best[0] and parts[i + 1] == best[1]):
                new.append(fused)
                i += 2
            else:
                new.append(parts[i])
                i += 1
        parts = new
    if cache is not None:
        cache[word] = parts
    return parts


def encode(text: str, ranks: dict[tuple[bytes, bytes], int],
           cache: dict[bytes, list[bytes]] | None = None) -> list[bytes]:
    out: list[bytes] = []
    for w in pretokenize(text):
        out.extend(encode_word(w, ranks, cache))
    return out


def chunk_token_windows(toks: list[bytes], chunk_tokens: int,
                        overlap: int) -> list[list[bytes]]:
    """The reference chunker's stride loop (vectorstore/chunker.py:
    chunk_tokens/overlap semantics) over a BPE token sequence: emit
    windows of `chunk_tokens` tokens advancing by `chunk_tokens -
    overlap`, last window short, single window when it all fits."""
    out = []
    start = 0
    while True:
        out.append(toks[start:start + chunk_tokens])
        if start + chunk_tokens >= len(toks):
            break
        start += chunk_tokens - overlap
    return out


# ----------------------------------------------------------- Spark side

def bpe_udfs(merges: list[tuple[bytes, bytes]], preview_k: int = 6):
    """(count_udf, preview_udf) pandas UDFs closing over the merges
    table: token count per text, and the first `preview_k` tokens as a
    '|'-joined hex string (a value-hashable fingerprint of the actual
    token stream, not just its length)."""
    from pyspark.sql import functions as F

    ranks = build_ranks(merges)

    @F.pandas_udf("int")
    def count_udf(s: pd.Series) -> pd.Series:
        cache: dict[bytes, list[bytes]] = {}
        return s.map(lambda t: len(encode(t or "", ranks, cache)))

    @F.pandas_udf("string")
    def preview_udf(s: pd.Series) -> pd.Series:
        cache: dict[bytes, list[bytes]] = {}
        return s.map(lambda t: "|".join(
            tok.hex() for tok in encode(t or "", ranks, cache)[:preview_k]))

    return count_udf, preview_udf
