"""Explicit skew handling: salted equi-joins on hot tiles (north rule).

Planet-style data has hot tiles (cities): a tile-keyed equi-join puts entire
hot tiles into single shuffle partitions. The salting here is explicit (not
just AQE): hot keys are detected from the A3 count table (already computed
for grouping — reused for free, SURVEY.md §7 risk 5), the big side gets a
deterministic salt in [0, factor) derived from a row hash (no RNG — rerunnable
byte-identical), and the small side is exploded once per salt value for the
hot keys only. Cold keys keep salt 0, so the small side grows by
``hot_keys × (factor-1)`` rows, not ×factor.

AQE's skew-join split remains enabled on top (``session.py``) — salting fixes
the *partitioning*, AQE fixes residual imbalance at runtime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def hot_keys_from_counts(counts: pd.DataFrame, key_col: str = "cell",
                         cnt_col: str = "cnt", skew_ratio: float = 8.0) -> list[int]:
    """Keys whose count exceeds ``skew_ratio`` × mean — the salting set."""
    if counts.empty:
        return []
    mean = counts[cnt_col].mean()
    hot = counts[counts[cnt_col] > skew_ratio * mean]
    return [int(k) for k in hot[key_col]]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: list[int],
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with hot keys salted ``factor``-ways.

    ``big`` rows on hot keys get salt = pmod(hash(all cols), factor) —
    deterministic; ``small`` rows on hot keys are replicated once per salt.
    Result is exactly the plain join's rows (verified in tests).
    """
    if not hot_keys:
        return big.join(small, key, how)
    hot_arr = F.array(*[F.lit(k) for k in hot_keys])
    is_hot_big = F.array_contains(hot_arr, F.col(key))
    b = big.withColumn(
        "_salt",
        F.when(is_hot_big, F.pmod(F.hash(*[F.col(c) for c in big.columns]), factor))
        .otherwise(F.lit(0)),
    )
    s = small.withColumn(
        "_salts",
        F.when(
            F.array_contains(hot_arr, F.col(key)),
            F.sequence(F.lit(0), F.lit(factor - 1)),
        ).otherwise(F.array(F.lit(0))),
    ).withColumn("_salt", F.explode("_salts")).drop("_salts")
    return b.join(s, [key, "_salt"], how).drop("_salt")
