"""Text / document operators for large-scale training-data pipelines.

All hot paths are either pure ``pyspark.sql.functions`` column expressions
(JVM-side, whole-stage codegen) or Arrow-batched pandas UDFs — no per-row
Python in any shuffle-adjacent stage.

Dedup family:
- :func:`exact_dedup`        hash-groupBy on a normalized fingerprint
- :func:`minhash_signatures` word-shingle MinHash (vectorized numpy)
- :func:`lsh_pairs`          banded LSH candidate pairs (explode + self-join)
- :func:`simhash64`          64-bit SimHash (vectorized numpy)
- :func:`ngram_jaccard_pairs` exact Jaccard on token sets within buckets

Analysis family:
- :func:`token_stats`        whitespace + regex token counts (pure F.*)
- :func:`quality_score`      length/punct/stopword/distinct ratios (pure F.*)
- :func:`lang_id`            char-frequency n-gram heuristic (pure F.*)
- :func:`doc_fingerprint`    normalized rolling fingerprint (md5)

At 100 TB the shapes matter more than the hashes: exact dedup is one
shuffle on the fingerprint; LSH is explode(bands) + shuffle on band key
(band cardinality >> doc count, so no hot keys); pair generation joins
bucket-local only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

STOPWORDS = ("the", "a", "of", "and", "to", "in")


# ----------------------------------------------------------------- exact --

def normalized_text(col="text"):
    """lowercase + collapse whitespace — the canonical dedup key."""
    return F.regexp_replace(F.lower(F.col(col)), r"\s+", " ")


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): md5 of normalized text — document fingerprinting."""
    return docs.select("doc_id", F.md5(normalized_text()).alias("fp"))


def exact_dedup(docs: DataFrame, key=None) -> DataFrame:
    """Exact duplicate groups: fingerprint -> (fp, n_docs, keep_doc_id).

    keep = min doc_id (first-wins, mirroring the tile-merge semantics)."""
    key = key if key is not None else F.md5(normalized_text())
    return (
        docs.select(key.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
    )


# --------------------------------------------------------------- minhash --

def _hash_params(n_hashes: int, seed: int = 1337):
    """Deterministic (a, b) pairs for the universal-hash family
    h_i(x) = (a_i * x + b_i) mod p."""
    rng = np.random.default_rng(seed)
    p = (1 << 61) - 1
    a = rng.integers(1, p, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, p, size=n_hashes, dtype=np.int64)
    return a, b, p


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 16, shingle_k: int = 3
) -> DataFrame:
    """(doc_id, sig array<bigint>): MinHash over word k-shingles.

    Shingles are hashed to 64-bit ints (md5-derived, stable across runs and
    machines), then the n_hashes universal hashes are applied vectorized in
    numpy per Arrow batch."""
    a, b, p = _hash_params(n_hashes)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            words = t.lower().split()
            if len(words) < shingle_k:
                shingles = [" ".join(words)] if words else [""]
            else:
                shingles = [
                    " ".join(words[i : i + shingle_k])
                    for i in range(len(words) - shingle_k + 1)
                ]
            base = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                    & 0x7FFFFFFFFFFFFFFF
                    for s in set(shingles)
                ),
                dtype=np.int64,
            )
            # (n_shingles, 1) x (n_hashes,) -> min over shingles
            hv = (base[:, None].astype(object) * a[None, :] + b[None, :]) % p
            out.append(hv.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    par = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(par).select("doc_id", sig_udf(F.col("text")).alias("sig"))


def lsh_pairs(signatures: DataFrame, bands: int = 4) -> DataFrame:
    """Banded LSH: split each signature into ``bands`` bands, bucket-join.

    Returns candidate pairs (doc_a < doc_b, band). One shuffle on the band
    bucket key; buckets are tiny so the self-join is bucket-local."""
    n = bands
    banded = signatures.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n - 1)),
                lambda i: F.slice(
                    F.col("sig"),
                    i * (F.size("sig") / n).cast("int") + 1,
                    (F.size("sig") / n).cast("int"),
                ),
            )
        ).alias("band", "chunk"),
    ).select(
        "doc_id", "band", F.xxhash64(F.to_json(F.struct("band", "chunk"))).alias("bucket")
    )
    x = banded.alias("x")
    y = banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.band") == F.col("y.band"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.band").alias("band"),
        )
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame, n_hashes: int = 16, bands: int = 4, threshold: float = 0.6,
    shingle_k: int = 3,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: candidates from banded LSH,
    verified by exact signature-estimated Jaccard >= threshold."""
    sigs = minhash_signatures(docs, n_hashes, shingle_k)
    cand = lsh_pairs(sigs, bands).select("doc_a", "doc_b").distinct()
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda p, q: (p == q).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.size("sig_a"),
        )
    )
    return est.filter(F.col("est_jaccard") >= threshold).select(
        "doc_a", "doc_b", "est_jaccard"
    )


# --------------------------------------------------------------- simhash --

def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash bigint): 64-bit SimHash over word hashes —
    bit b of the output is the majority vote of bit b across word hashes."""

    @F.pandas_udf(T.LongType())
    def sim_udf(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = t.lower().split()
            if not words:
                continue
            hv = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                    for w in words
                ),
                dtype=np.uint64,
            )
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            val = np.uint64(0)
            for bpos in np.nonzero(votes > 0)[0]:
                val |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(val.astype("i8"))
        return pd.Series(out)

    par = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(par).select("doc_id", sim_udf(F.col("text")).alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on the top-16
    bits to avoid the quadratic join (standard prefix blocking)."""
    sh = simhash64(docs).withColumn(
        "block", F.shiftrightunsigned("simhash", 48)
    )
    x, y = sh.alias("x"), sh.alias("y")
    return (
        x.join(
            y,
            (F.col("x.block") == F.col("y.block"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .withColumn(
            "hamming",
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            "hamming",
        )
    )


# ---------------------------------------------------------------- jaccard --

def ngram_jaccard_pairs(
    docs: DataFrame, bucket_col: str = "source", min_jaccard: float = 0.5
) -> DataFrame:
    """Exact token-set Jaccard for doc pairs within a bucket column (pure
    DataFrame ops: array_intersect / array_union on distinct token arrays)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(par, bucket_col).select(
        "doc_id",
        F.col(bucket_col).alias("bucket"),
        F.array_distinct(F.split(F.lower(F.col("text")), r"\s+")).alias("toks"),
    )
    x, y = toks.alias("x"), toks.alias("y")
    return (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            (
                F.size(F.array_intersect("x.toks", "y.toks"))
                / F.size(F.array_union("x.toks", "y.toks"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


# ---------------------------------------------------------------- analysis --

def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + regex-word count + char count, all JVM-side."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), F.lit(0))).alias(
            "word_tokens"
        ),
        F.length("text").alias("chars"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + combined score (pure column algebra)."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    stop = F.array([F.lit(w) for w in STOPWORDS])
    stop_ratio = F.size(F.array_intersect(F.array_distinct(toks), stop)) / F.greatest(
        F.size(F.array_distinct(toks)), F.lit(1)
    )
    mean_word_len = (F.length(F.regexp_replace(F.col("text"), r"\s+", ""))) / n
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(
            F.least(n / 100.0, F.lit(1.0)) * distinct_ratio, 4
        ).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Toy char-frequency language heuristic (deterministic, SQL-parity):
    ranks a few letter frequencies — stands in for an n-gram LID model.
    Returns (doc_id, lang, predicted)."""
    t = F.lower(F.col("text"))

    def freq(ch):
        return (F.length(t) - F.length(F.regexp_replace(t, ch, ""))) / F.length(t)

    e, a, o, i_, n = freq("e"), freq("a"), freq("o"), freq("i"), freq("n")
    predicted = (
        F.when((e > a) & (e > o), F.lit("en"))
        .when((a > o) & (a > i_), F.lit("es"))
        .when(o > n, F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    return docs.select("doc_id", "lang", predicted.alias("predicted"))
