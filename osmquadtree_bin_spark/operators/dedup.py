"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (it has none of these) — first-class engine
components per the build brief:

  * exact           — md5 hash-groupBy, keep the smallest doc_id per hash.
  * minhash LSH     — shingle → minhash (vectorized numpy, one pandas UDF) →
                      band → bucket join → candidate pairs → exact Jaccard
                      verify. Shuffle cost: one groupBy on (band, bucket)
                      instead of the quadratic all-pairs join.
  * simhash         — 64-bit simhash over token hashes, near-dup = hamming
                      distance ≤ k via band partitioning.
  * n-gram Jaccard  — exact verification kernel (numpy set ops).

All hashing uses numpy/Python's stable md5/blake2 so results are
deterministic across runs and executors (never rely on PYTHONHASHSEED).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# --------------------------------------------------------------------- exact
def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: canonical row per distinct text = min id per md5(text).
    One shuffle (groupBy hash); map-side partial agg applies."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


# ------------------------------------------------------------------- minhash
_MERSENNE = (1 << 61) - 1


def _hash_shingles(text: str, n: int) -> np.ndarray:
    """Stable 64-bit hashes of word n-grams (blake2b — deterministic)."""
    words = text.split()
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "little")
    return out


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig:array<long>) — signatures computed in one Arrow-batched UDF."""
    a, b = _minhash_params(num_perm)

    @pandas_udf(ArrayType(LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.fillna(""):
            h = _hash_shingles(t, shingle_n)
            if h.size == 0:
                out.append([0] * num_perm)
                continue
            # (a*h + b) mod p, min over shingles — vectorized perm × shingle
            vals = (a[:, None] * (h[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return docs.select(F.col(id_col).alias("id"), _sig(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4, jaccard_threshold: float = 0.7
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH + signature-level verify.

    Shuffle shape: explode to (band, bucket) → self-join inside buckets only.
    Estimated Jaccard = fraction of matching minhash positions.
    """
    b = (
        sigs.select(
            "id",
            "sig",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda i: F.md5(
                        F.concat_ws(
                            ",",
                            F.slice(
                                F.col("sig").cast("array<string>"),
                                i * rows_per_band + 1,
                                rows_per_band,
                            ),
                        )
                    ),
                )
            ).alias("band", "bucket"),
        )
    )
    left = b.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bucket")
    right = b.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bucket")
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.size("sig_a")
    ).alias("est_jaccard")
    return cand.select("id_a", "id_b", est).filter(F.col("est_jaccard") >= jaccard_threshold)


# ------------------------------------------------------------------- simhash
def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash:long) — 64-bit simhash over stable word hashes."""

    @pandas_udf(LongType())
    def _sim(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.fillna("")):
            words = t.split()
            if not words:
                continue
            hs = np.empty(len(words), dtype=np.uint64)
            for j, w in enumerate(words):
                hs[j] = int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
                )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int32
            )
            score = (2 * bits - 1).sum(axis=0)
            val = ((score > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
                dtype=np.uint64
            )
            out[i] = np.array([val], dtype=np.uint64).view(np.int64)[0]
        return pd.Series(out)

    return docs.select(F.col(id_col).alias("id"), _sim(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(sh: DataFrame, max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming. Band trick: any
    pair within hamming k must agree exactly on at least one of k+1 bands —
    equi-join per band, union, exact popcount verify (JVM-side bit_count)."""
    nbands = max(bands, max_hamming + 1)
    width = 64 // nbands
    out = None
    for i in range(nbands):
        band = F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        l = sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("h_a"), band.alias("b"))
        r = sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("h_b"), band.alias("b"))
        j = l.join(r, "b").filter(F.col("id_a") < F.col("id_b")).drop("b")
        out = j if out is None else out.unionByName(j)
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        out.dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------------------ ngram jaccard
def ngram_jaccard_pairs(
    docs: DataFrame, pairs: DataFrame, n: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Exact word-n-gram Jaccard for given candidate (id_a, id_b) pairs —
    the verify stage after LSH candidates."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size(F.split(F.col(text_col), " ")) - n, F.lit(0)),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.split(F.col(text_col), " "), i + 1, n)
                ),
            )
        ).alias("grams"),
    )
    a = grams.select(F.col("id").alias("id_a"), F.col("grams").alias("g_a"))
    b = grams.select(F.col("id").alias("id_b"), F.col("grams").alias("g_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    union = F.size(F.array_union("g_a", "g_b")).cast("double")
    return joined.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    )
