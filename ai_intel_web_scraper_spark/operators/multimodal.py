"""Multimodal (binary-column) operators for the image+caption corpus.

Images travel as opaque `binary` columns with typed metadata (input_hint
shape). Decode and feature extraction run in Arrow-batched mapInPandas over
the REAL pure-Python codec from functions/codec.py (PNG + deterministic
lossy stand-in) — the Spark-side plumbing (schemas, batching, partition
behavior) is production-shaped. Audio decode is REAL for PCM WAV (stdlib
`wave`; other codecs degrade to decode_ok=false rows — the soundfile/
librosa swap-in point). Video frame sampling is REAL over the MJPN frame
container (functions/codec.py, the declared mp4/ffmpeg stand-in):
random-access seek decodes only the sampled frames; swapping
mjpng_decode_frame for ffmpeg bindings is the single change a real
cluster needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codec import average_phash, decode_image

IMAGE_FEATURES_SCHEMA = ("image_id string, w int, h int, fmt string, "
                         "mean_r double, mean_g double, mean_b double, "
                         "phash long, decode_ok boolean")


def image_features(pages: DataFrame) -> DataFrame:
    """Decode each image and emit per-channel means + recomputed phash.
    One Arrow batch per call; bytes never enter a shuffle (narrow map)."""
    def fn(iterator):
        for pdf in iterator:
            rows = []
            for image_id, fmt, raw in zip(pdf["image_id"], pdf["fmt"],
                                          pdf["bytes"]):
                try:
                    px = decode_image(bytes(raw))
                    m = px.reshape(-1, 3).mean(axis=0)
                    rows.append((image_id, int(px.shape[1]),
                                 int(px.shape[0]), fmt,
                                 round(float(m[0]), 6), round(float(m[1]), 6),
                                 round(float(m[2]), 6),
                                 average_phash(px), True))
                except Exception:
                    rows.append((image_id, None, None, fmt,
                                 None, None, None, None, False))
            out = pd.DataFrame(rows, columns=[
                "image_id", "w", "h", "fmt", "mean_r", "mean_g", "mean_b",
                "phash", "decode_ok"])
            # pandas silently promotes an int column to float64 when ANY
            # row in the batch holds None — a 64-bit phash loses its low
            # ~11 bits to the 53-bit mantissa, so ONE corrupt image would
            # corrupt every other row's phash in its batch. Pin the
            # nullable-int dtype explicitly (Arrow carries it exactly).
            out["phash"] = pd.array([r[7] for r in rows], dtype="Int64")
            yield out
    return (pages.select("image_id", "fmt", "bytes")
            .mapInPandas(fn, schema=IMAGE_FEATURES_SCHEMA))


def image_resize(pages: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (numpy) re-encoded as PNG — a real transform
    over the binary column; demonstrates decode -> transform -> re-encode."""
    from ..functions.codec import png_encode

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for image_id, raw in zip(pdf["image_id"], pdf["bytes"]):
                px = decode_image(bytes(raw))
                ys = (np.arange(out_h) * px.shape[0] // out_h)
                xs = (np.arange(out_w) * px.shape[1] // out_w)
                small = px[ys][:, xs]
                rows.append((image_id, png_encode(small), out_w, out_h))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h"])
    return (pages.select("image_id", "bytes")
            .mapInPandas(fn, schema="image_id string, bytes binary, w int, h int"))


def phash_hamming_neardup(pages: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate IMAGES by perceptual-hash hamming distance via the
    shared guaranteed-recall block LSH (no O(n^2))."""
    from .dedup import hamming_block_pairs
    return hamming_block_pairs(
        pages.select("image_id", "phash"), "image_id", "phash", max_hamming)


def incremental_phash_neardup(new_pages: DataFrame, index_pages: DataFrame,
                              max_hamming: int = 6,
                              index_blocks: DataFrame | None = None,
                              broadcast_delta: bool = False) -> DataFrame:
    """Incremental image near-dup: probe only the day's NEW images against
    the archive's persisted phash block table (`dedup.hamming_block_rows`
    output — recomputed from `index_pages` here so the oracle can check
    it; production reads it back from the store and appends the delta's
    blocks). Index-vs-index pairs are never re-derived: per-round cost
    scales with the crawl delta, not the image archive. Returns
    (id_a, id_b, hamming, vs_index) — see
    `dedup.incremental_hamming_neardup` for the recall argument."""
    from .dedup import incremental_hamming_neardup
    return incremental_hamming_neardup(
        new_pages.select("image_id", "phash"),
        index_pages.select("image_id", "phash"),
        "image_id", "phash", max_hamming, index_blocks=index_blocks,
        broadcast_delta=broadcast_delta)


VIDEO_SIGNATURE_SCHEMA = ("video_id string, n_sampled int, signature long, "
                          "decode_ok boolean")


def video_signatures(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Order-insensitive 64-bit video signature = SimHash over the phashes
    of every `every_n`-th frame: for each bit position the sampled frames
    vote +1/-1 by their phash bit, and the signature bit is 1 iff the vote
    sum is positive (ties -> 0, a fixed rule so both engines agree).
    Sharing most frames => most vote sums keep their sign => small hamming
    distance; the signature tolerates a few edited/inserted frames, which
    per-frame exact hashing cannot. Random-access seek decodes ONLY the
    sampled frames (cost scales with frames kept, not stored); corrupt
    bytes degrade to a decode_ok=false row with a NULL signature, never a
    task failure. Bytes stay inside this narrow map — only the 8-byte
    signature crosses any shuffle downstream."""
    from ..functions.codec import (average_phash, mjpng_decode_frame,
                                   mjpng_frame_count)

    if every_n < 1:
        # a caller bug must not masquerade as "corrupt bytes" (the
        # range() step error would be swallowed by the per-row except)
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for video_id, raw in zip(pdf["video_id"], pdf["bytes"]):
                try:
                    data = bytes(raw)
                    n = mjpng_frame_count(data)
                    votes = np.zeros(64, dtype=np.int64)
                    n_sampled = 0
                    for i in range(0, n, every_n):
                        ph = average_phash(mjpng_decode_frame(data, i))
                        u = ph & 0xFFFFFFFFFFFFFFFF
                        for j in range(64):
                            votes[j] += 1 if (u >> j) & 1 else -1
                        n_sampled += 1
                    sig = 0
                    for j in range(64):
                        if votes[j] > 0:
                            sig |= 1 << j
                    if sig >= 1 << 63:  # reinterpret as signed int64
                        sig -= 1 << 64
                    rows.append((video_id, n_sampled, sig, True))
                except Exception:
                    rows.append((video_id, None, None, False))
            out = pd.DataFrame(rows, columns=[
                "video_id", "n_sampled", "signature", "decode_ok"])
            # same pandas trap as image_features' phash: None in the
            # batch => int64 -> float64 -> the signature's low bits
            # round away. Nullable Int64 keeps it exact.
            out["signature"] = pd.array([r[2] for r in rows], dtype="Int64")
            out["n_sampled"] = pd.array([r[1] for r in rows], dtype="Int64")
            yield out
    return (df.select(F.col("video_id"), F.col("bytes"))
            .mapInPandas(fn, schema=VIDEO_SIGNATURE_SCHEMA))


def video_neardup(df: DataFrame, max_hamming: int = 6,
                  every_n: int = 2) -> DataFrame:
    """Near-duplicate VIDEOS: sampled-frame SimHash signatures
    (`video_signatures`) into the shared guaranteed-recall hamming block
    LSH. All 64 signature bits are real (every bit position takes votes),
    so the block tiling uses the full width. Undecodable clips are
    excluded (NULL signatures never join)."""
    from .dedup import hamming_block_pairs
    sigs = video_signatures(df, every_n=every_n).where(F.col("decode_ok"))
    return hamming_block_pairs(sigs, "video_id", "signature", max_hamming,
                               bits=64)


AUDIO_FEATURES_SCHEMA = ("audio_id string, duration_s double, "
                         "sample_rate int, channels int, rms double, "
                         "decode_ok boolean")


def audio_features(df: DataFrame) -> DataFrame:
    """REAL PCM-WAV decode via the stdlib `wave` module (RIFF/WAVE with
    8/16/32-bit integer PCM — no external codec library needed); any other
    container/codec yields a decode_ok=false row, the swap-in point for
    soundfile/librosa on a real cluster. Arrow-batched mapInPandas; audio
    bytes never enter a shuffle (narrow map), mirroring image_features.
    Emits duration, sample rate, channel count, and full-scale-normalized
    RMS over all channels."""
    def fn(iterator):
        import io
        import wave
        widths = {1: np.int8, 2: np.int16, 4: np.int32}
        for pdf in iterator:
            rows = []
            for audio_id, raw in zip(pdf["audio_id"], pdf["bytes"]):
                try:
                    with wave.open(io.BytesIO(bytes(raw))) as w:
                        n = w.getnframes()
                        sr = w.getframerate()
                        sw = w.getsampwidth()
                        ch = w.getnchannels()
                        data = np.frombuffer(w.readframes(n),
                                             dtype=widths[sw])
                        scale = float(1 << (8 * sw - 1))
                        rms = (float(np.sqrt(np.mean(
                            (data.astype(np.float64) / scale) ** 2)))
                            if data.size else 0.0)
                        rows.append((audio_id, n / sr, sr, ch, rms, True))
                except Exception:
                    rows.append((audio_id, None, None, None, None, False))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "duration_s", "sample_rate", "channels",
                "rms", "decode_ok"])
    return (df.select(F.col("audio_id"), F.col("bytes"))
            .mapInPandas(fn, schema=AUDIO_FEATURES_SCHEMA))


AUDIO_FP_WINDOWS = 65  # 65 energy windows -> 64 difference bits

AUDIO_FP_SCHEMA = ("audio_id string, fingerprint long, n_windows int, "
                   "decode_ok boolean")


def audio_fingerprints(df: DataFrame,
                       n_windows: int = AUDIO_FP_WINDOWS) -> DataFrame:
    """64-bit acoustic fingerprint by the energy-difference rule
    (Haitsma & Kalker's robust-hash shape, publicly documented): the
    clip's first n_windows*L samples (L = frames // n_windows) split
    into n_windows equal windows, integer energy E_w = sum(sample^2)
    per window across all channels, bit w set <=> E[w+1] > E[w]
    (strict — ties to 0, a fixed rule both engines replay). Energies
    are EXACT int64 sums of integer PCM, so the fingerprint is
    bit-reproducible anywhere — the property that lets a DuckDB oracle
    recompute it analytically. Undecodable or shorter-than-n_windows
    clips degrade to decode_ok=false rows. Bytes stay in this narrow
    map; only the 8-byte fingerprint shuffles downstream."""
    if n_windows < 2:
        raise ValueError(f"n_windows must be >= 2, got {n_windows}")

    def fn(iterator):
        import io
        import wave
        widths = {1: np.int8, 2: np.int16, 4: np.int32}
        for pdf in iterator:
            rows = []
            for audio_id, raw in zip(pdf["audio_id"], pdf["bytes"]):
                try:
                    with wave.open(io.BytesIO(bytes(raw))) as w:
                        n = w.getnframes()
                        sw = w.getsampwidth()
                        ch = w.getnchannels()
                        data = np.frombuffer(w.readframes(n),
                                             dtype=widths[sw])
                    frames = data.size // ch
                    L = frames // n_windows
                    if L == 0:
                        raise ValueError("clip shorter than n_windows")
                    use = (data[:n_windows * L * ch].astype(np.int64)
                           .reshape(n_windows, L * ch))
                    energy = (use * use).sum(axis=1)  # exact int64
                    fp = 0
                    for w_i in range(n_windows - 1):
                        if int(energy[w_i + 1]) > int(energy[w_i]):
                            fp |= 1 << w_i
                    if fp >= 1 << 63:  # n_windows=65 fills bit 63
                        fp -= 1 << 64
                    rows.append((audio_id, fp, n_windows, True))
                except Exception:
                    rows.append((audio_id, None, None, False))
            out = pd.DataFrame(rows, columns=[
                "audio_id", "fingerprint", "n_windows", "decode_ok"])
            # the image_features/video_signatures pandas trap: None in
            # the batch must not float64-round the 64-bit fingerprint
            out["fingerprint"] = pd.array([r[1] for r in rows],
                                          dtype="Int64")
            out["n_windows"] = pd.array([r[2] for r in rows],
                                        dtype="Int64")
            yield out
    return (df.select(F.col("audio_id"), F.col("bytes"))
            .mapInPandas(fn, schema=AUDIO_FP_SCHEMA))


def audio_hamming_neardup(df: DataFrame, max_hamming: int = 6,
                          n_windows: int = AUDIO_FP_WINDOWS) -> DataFrame:
    """Near-duplicate AUDIO clips: energy-difference fingerprints into
    the shared guaranteed-recall hamming block LSH. Effective width =
    n_windows-1 difference bits (64 at the default); undecodable clips
    never reach the join."""
    from .dedup import hamming_block_pairs
    fps = (audio_fingerprints(df, n_windows=n_windows)
           .where(F.col("decode_ok")))
    return hamming_block_pairs(fps, "audio_id", "fingerprint", max_hamming,
                               bits=n_windows - 1)


VIDEO_FRAMES_SCHEMA = ("video_id string, frame_index int, w int, h int, "
                       "mean_r double, mean_g double, mean_b double, "
                       "frame_png binary, decode_ok boolean")


def video_frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL frame sampling over the MJPN container (functions/codec.py —
    the declared mp4/ffmpeg stand-in): random-access seek via the length
    table decodes ONLY every_n-th frame, never the full clip (the property
    that matters at 100 TB: sampling cost scales with frames KEPT, not
    frames stored). One input row fans out to ceil(n/every_n) frame rows
    with per-channel means and the re-encoded PNG; undecodable bytes
    yield a single decode_ok=false row. Video bytes reach the UDF via a
    narrow map and the (much smaller) sampled frames are what flow on."""
    from ..functions.codec import mjpng_decode_frame, mjpng_frame_count, png_encode

    def fn(iterator):
        for pdf in iterator:
            rows = []
            for video_id, raw in zip(pdf["video_id"], pdf["bytes"]):
                try:
                    data = bytes(raw)
                    n = mjpng_frame_count(data)
                    for i in range(0, n, every_n):
                        px = mjpng_decode_frame(data, i)
                        m = px.reshape(-1, 3).mean(axis=0)
                        rows.append((video_id, i, int(px.shape[1]),
                                     int(px.shape[0]),
                                     round(float(m[0]), 6),
                                     round(float(m[1]), 6),
                                     round(float(m[2]), 6),
                                     png_encode(px), True))
                except Exception:
                    rows.append((video_id, None, None, None,
                                 None, None, None, None, False))
            yield pd.DataFrame(rows, columns=[
                "video_id", "frame_index", "w", "h", "mean_r", "mean_g",
                "mean_b", "frame_png", "decode_ok"])
    return (df.select(F.col("video_id"), F.col("bytes"))
            .mapInPandas(fn, schema=VIDEO_FRAMES_SCHEMA))


# Image-text pair QA (the LAION-style curation pass an image+caption
# corpus needs before training): (a) exact-duplicate images (same phash)
# re-hosted under many pages keep ONE representative per caption;
# (b) a caption attached to many DISTINCT images is boilerplate ("stock
# photo", alt-text templates) and carries no supervision signal — drop
# the whole caption group. The reference ingests image+caption pairs
# as-is (no pair-level QA anywhere in scrapers/).
CAPTION_SPREAD_MAX = 3


def image_text_qa(pages: DataFrame,
                  spread_max: int = CAPTION_SPREAD_MAX) -> DataFrame:
    """Per-page QA labels over (image_id, phash, caption):
    phash_dups = exact-duplicate group size, caption_spread = distinct
    images under this page's caption, keep = first page (by image_id) of
    its (phash, caption) group AND caption not generic.

    Scale shape: the dup-group window and keep-first rank share one hash
    partitioning on phash; caption spread is a separate groupBy joined
    back on caption (shuffle equi-join — caption cardinality is
    data-sized, so no broadcast assumption). Outputs are integers and a
    boolean; bytes never enter the plan (ReadSchema prunes to three
    columns)."""
    from pyspark.sql import Window
    wd = Window.partitionBy("phash")
    wr = Window.partitionBy("phash", "caption").orderBy("image_id")
    spread = (pages.groupBy("caption")
              .agg(F.countDistinct("phash").alias("caption_spread")))
    return (pages.select("image_id", "phash", "caption")
            .withColumn("phash_dups", F.count("*").over(wd))
            .withColumn("_rn", F.row_number().over(wr))
            .join(spread, "caption")
            .select(F.col("image_id"), F.col("phash_dups").cast("long"),
                    F.col("caption_spread").cast("long"),
                    ((F.col("_rn") == 1)
                     & (F.col("caption_spread") <= F.lit(spread_max)))
                    .alias("keep")))


# --- Image-text pair curation: alignment score + filtering chain ----------
# A deterministic stand-in for CLIP-score filtering (the DataComp/LAION
# keep rule: drop pairs whose image and caption don't agree). The real
# model call is out of scope by the same declaration as V9's hash
# embeddings (reference `vectorstore/embedder.py` calls a remote model);
# what IS real — and what the engine must get right at 10^10 pairs — is
# the Spark shape: a narrow two-column pass (bytes never read), integer
# arithmetic end to end, and a per-stage accounted filter chain.
#
# Score: project the caption into {-1,+1}^60 via md5-60bit token hashes
# (bit d of each token hash votes +/-1; the sign of the vote sum is the
# caption's d-th component) and take the integer dot product with the
# image's phash bits as {-1,+1}^60. Range [-60, 60]; >= ALIGN_KEEP_MIN
# keeps. Every step replays verbatim in DuckDB (same md5 slice trick as
# the shuffle keys).
ALIGN_DIM = 60
ALIGN_KEEP_MIN = 0
PAIR_MIN_SIDE = 48            # least(w,h) floor (DataComp uses 200 @ full res)
PAIR_MAX_ASPECT_PCT = 200     # greatest/least * 100, integer percent
PAIR_CAPTION_MIN_TOKENS = 2   # CLIP-style caption sanity window
PAIR_CAPTION_MAX_TOKENS = 77


def alignment_score_udf():
    """Arrow UDF: (caption, phash) -> integer alignment score. Token
    hashes are md5-60bit (`conv(substring(md5(t),1,15),16,10)` — the
    engine-wide DuckDB-replayable trick), memoized per batch; the
    per-row work is one 60-wide numpy fold per token."""
    import hashlib
    import re

    dims = np.arange(ALIGN_DIM, dtype=np.int64)

    @F.pandas_udf("long")
    def score(caption: pd.Series, phash: pd.Series) -> pd.Series:
        cache: dict = {}
        out = np.empty(len(caption), dtype=np.int64)
        for i, (cap, ph) in enumerate(zip(caption, phash)):
            acc = np.zeros(ALIGN_DIM, dtype=np.int64)
            for t in re.split(r"\s+", (cap or "").lower()):
                if not t:
                    continue
                h = cache.get(t)
                if h is None:
                    h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                    cache[t] = h
                acc += ((h >> dims) & 1) * 2 - 1
            sgn = np.where(acc >= 0, 1, -1)
            pbits = ((int(ph) >> dims) & 1) * 2 - 1
            out[i] = int((sgn * pbits).sum())
        return pd.Series(out)

    return score


def pair_alignment(pages: DataFrame,
                   keep_min: int = ALIGN_KEEP_MIN) -> DataFrame:
    """(image_id, align_score, keep) per image+caption pair. One narrow
    Arrow map over exactly (image_id, caption, phash) — the bytes column
    never enters the plan, so at 10^10 pairs the scan reads ~tens of
    bytes per row, not the payload."""
    sc = alignment_score_udf()(F.col("caption"), F.col("phash"))
    return (pages.select("image_id", sc.alias("align_score"))
            .withColumn("keep", F.col("align_score") >= F.lit(keep_min)))


def _caption_tokens_col(caption):
    """Native token count: split on whitespace runs, drop empties —
    mirrors the UDF's tokenizer and DuckDB's list_filter replay."""
    return F.size(F.filter(F.split(F.lower(caption), r"\s+"),
                           lambda x: x != ""))


def text_sign_mask(text: str) -> int:
    """A text's {-1,+1}^ALIGN_DIM sign vector packed as an int bitmask
    (bit d set <=> sign +1) — the SAME md5-60bit token-vote rule as
    `alignment_score_udf`, evaluated once in plain Python. For a LITERAL
    query this turns the whole alignment dot product into native
    integer ops: agree/disagree counting over packed bits gives
    score = ALIGN_DIM - 2*popcount((phash & low60) XOR mask)."""
    import hashlib
    import re

    acc = [0] * ALIGN_DIM
    for t in re.split(r"\s+", (text or "").lower()):
        if not t:
            continue
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for d in range(ALIGN_DIM):
            acc[d] += 1 if (h >> d) & 1 else -1
    return sum(1 << d for d in range(ALIGN_DIM) if acc[d] >= 0)


def crossmodal_text_topk(pages: DataFrame, queries: list[tuple[str, str]],
                         k: int = 10) -> DataFrame:
    """Cross-modal retrieval with the CLIP-proxy score: rank IMAGES for
    literal TEXT queries. Each query's sign vector is a driver-side
    constant (`text_sign_mask`), so scoring is pure whole-stage-codegen
    integer arithmetic — one bit_count per (image, query), NO UDF, the
    bytes column never read; a Q-query search costs one narrow scan with
    a Q-wide explode (Q is literal-small; the image side never
    duplicates through a join). Top-k per query = rank window with a
    LITERAL bound (WindowGroupLimit pushes the limit into the shuffle),
    ties broken by image_id for cross-engine determinism. Returns
    (query_id, image_id, score, rank), rank 1-based.

    The production swap-in keeps the shape: replace `text_sign_mask` /
    phash with real text/image embedding calls and this becomes
    brute-force vector retrieval; the ANN family (ivf/pq) is the scale
    path beyond that."""
    if not queries:
        raise ValueError("queries must be non-empty")
    m60 = (1 << ALIGN_DIM) - 1
    per_q = [
        F.struct(
            F.lit(qid).alias("query_id"),
            (F.lit(ALIGN_DIM) - 2 * F.bit_count(
                F.col("phash").bitwiseAND(F.lit(m60))
                .bitwiseXOR(F.lit(text_sign_mask(text)))))
            .cast("long").alias("score"))
        for qid, text in queries]
    scored = (pages.select("image_id", F.explode(F.array(*per_q))
                           .alias("_q"))
              .select("image_id", "_q.query_id", "_q.score"))
    from pyspark.sql import Window
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("score"), F.asc("image_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.lit(int(k)))
            .select("query_id", "image_id", "score", "rank"))


def pair_filters(pages: DataFrame,
                 min_side: int = PAIR_MIN_SIDE,
                 max_aspect_pct: int = PAIR_MAX_ASPECT_PCT,
                 cap_min: int = PAIR_CAPTION_MIN_TOKENS,
                 cap_max: int = PAIR_CAPTION_MAX_TOKENS,
                 align_min: int = ALIGN_KEEP_MIN) -> DataFrame:
    """DataComp-style image-text pair filtering chain with per-stage
    accounting (the hygiene_pipeline convention applied to the image
    corpus): resolution floor -> aspect-ratio ceiling -> caption token
    window -> alignment threshold. Emits one row per pair with every
    gate's verdict, `dropped_at` = the FIRST failing stage (fixed order,
    'kept' if none) and the final keep — all integers/booleans/labels,
    single narrow pass, no shuffle (plan-asserted in the audit)."""
    t = _caption_tokens_col(F.col("caption"))
    sc = alignment_score_udf()(F.col("caption"), F.col("phash"))
    # integer percent, DIV truncation — w/h are positive so Spark DIV and
    # DuckDB // agree
    aspect_pct = F.expr("(greatest(w, h) * 100) DIV least(w, h)")
    df = pages.select(
        "image_id", "w", "h",
        t.cast("long").alias("cap_tokens"),
        sc.alias("align_score"),
        (F.least("w", "h") >= F.lit(min_side)).alias("side_ok"),
        (aspect_pct <= F.lit(max_aspect_pct)).alias("aspect_ok"))
    df = df.withColumn(
        "caption_ok", (F.col("cap_tokens") >= F.lit(cap_min))
        & (F.col("cap_tokens") <= F.lit(cap_max)))
    df = df.withColumn("align_ok", F.col("align_score") >= F.lit(align_min))
    dropped = (F.when(~F.col("side_ok"), F.lit("dims"))
               .when(~F.col("aspect_ok"), F.lit("aspect"))
               .when(~F.col("caption_ok"), F.lit("caption"))
               .when(~F.col("align_ok"), F.lit("alignment"))
               .otherwise(F.lit("kept")))
    return (df.withColumn("dropped_at", dropped)
            .withColumn("keep", F.col("dropped_at") == "kept"))
