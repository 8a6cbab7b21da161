"""Similarity search over embedding columns (array<float>).

  * ``cosine_topk``      — brute-force exact top-k per query: broadcast the
    (small) query set, JVM-side dot product via ``aggregate``/``zip_with`` —
    whole-stage codegen, no Python in the hot path — then a row_number window.
  * ``lsh_bucket_topk``  — scale path: random-hyperplane LSH buckets
    (signature computed once per row in a pandas UDF), candidates restricted
    to same-bucket rows (multi-probe by unioning B tables), exact re-rank.

At 100 TB the brute force is O(Q×N) but embarrassingly parallel and
shuffle-free (broadcast queries); the LSH variant trades recall for a
bucket-equi-join that prunes N.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def _cos_expr(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """embeddings: (vec_id, embedding); queries: (query_id, qvec).
    Returns (query_id, vec_id, rank, cosine). Exact."""
    cand = embeddings.crossJoin(F.broadcast(queries))
    cos = _cos_expr("embedding", "qvec")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        cand.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature(dim: int, nbits: int = 16, seed: int = 13):
    """Returns a pandas UDF computing the random-hyperplane LSH bucket."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim)).astype(np.float32)

    @pandas_udf(LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        proj = m @ planes.T  # (batch, nbits)
        bits = (proj > 0).astype(np.uint64)
        sig = (bits << np.arange(nbits, dtype=np.uint64)[None, :]).sum(axis=1)
        return pd.Series(sig.astype(np.int64))

    return _sig


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    nbits: int = 12,
    multiprobe: int = 1,
    tables: int = 2,
) -> DataFrame:
    """Approximate top-k: same-bucket candidates, exact cosine re-rank.

    Recall tunable three ways (all keep candidates an equi-join):
      * fewer ``nbits``   → bigger buckets;
      * ``multiprobe``=m  → the QUERY side also probes every bucket within
        hamming m of its signature (explode over a literal XOR-mask array);
      * ``tables``=L      → L independent hyperplane tables (different
        seeds), candidates unioned then (query_id, vec_id)-deduped — the
        classic LSH recall lever, linear cost in L.
    Recall@k vs brute force is pinned by test_ann_recall on clustered data
    (on uniform random vectors top-k neighbours are barely closer than
    random points and ANY bucketing scheme has low recall)."""
    masks = [0]
    if multiprobe >= 1:
        masks += [1 << i for i in range(nbits)]
    if multiprobe >= 2:
        masks += [(1 << i) | (1 << j) for i in range(nbits) for j in range(i)]
    if multiprobe >= 3:
        raise ValueError("multiprobe > 2 explodes the probe count; lower nbits instead")
    cand = None
    for t in range(tables):
        sig = hyperplane_signature(dim, nbits, seed=13 + 101 * t)
        e = embeddings.withColumn("bucket", sig(F.col("embedding")))
        q = queries.withColumn("_b0", sig(F.col("qvec"))).withColumn(
            "bucket",
            F.explode(F.array(*[F.col("_b0").bitwiseXOR(F.lit(m)) for m in masks])),
        ).drop("_b0")
        j = e.join(F.broadcast(q), "bucket").drop("bucket")
        cand = j if cand is None else cand.unionByName(j)
    cos = _cos_expr("embedding", "qvec")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        cand.dropDuplicates(["query_id", "vec_id"])
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
