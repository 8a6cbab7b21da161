"""Deliberately (re)generate golden tiling fixtures. Run from repo root:

    python tests/make_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from osmquadtree_bin_spark.tiling import find_groups, group_lines, tree_lines  # noqa: E402
from tests.test_tiling_golden import _synth_counts  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def main():
    os.makedirs(GOLDEN, exist_ok=True)
    cells, counts = _synth_counts()
    with open(os.path.join(GOLDEN, "qts.txt"), "w") as f:
        f.write("\n".join(tree_lines(cells, counts)) + "\n")
    g = find_groups(cells, counts, target=8000, minimum=4000)
    with open(os.path.join(GOLDEN, "groups.txt"), "w") as f:
        f.write("\n".join(group_lines(g)) + "\n")
    print(f"wrote goldens: {len(cells)} tree nodes, {len(g)} groups")

    if len(sys.argv) > 1 and sys.argv[1] == "oracle":
        # Pin the five non-SQL-expressible queries (q26-q30) as parquet
        # fixtures the driver's DuckDB oracle can read back: the semantics
        # are independently tested in pytest (tiling goldens, PIP pandas
        # oracle, dedup property tests); the fixture freezes the exact
        # output at the driver's correctness scale (sf0.01).
        import importlib.util

        import pyarrow as pa
        import pyarrow.parquet as pq

        from osmquadtree_bin_spark.session import get_spark

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "entry", os.path.join(repo, "__spark_entry__.py")
        )
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        spark = get_spark(app="make-goldens", master="local[8]", shuffle_partitions=8)
        qs = m.queries()
        # one fixture set per scale the contract is checked at: the driver
        # gates at sf0.01, the pytest contract suite at sf0.001
        for sf in ("sf0.001", "sf0.01"):
            odir = os.path.join(GOLDEN, "oracle", sf)
            os.makedirs(odir, exist_ok=True)
            for name in (
                "q26_tiling_pipeline",
                "q27_pip_polygon",
                "q28_minhash_pairs",
                "q29_simhash_pairs",
                "q30_multimodal_features",
                "q32_ivf_topk",
                "q33_embedding_near_dup",
            ):
                pdf = qs[name](spark, f"/root/testdata/{sf}").toPandas()
                pdf = pdf.sort_values(list(sorted(pdf.columns))).reset_index(drop=True)
                pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                               os.path.join(odir, f"{name}.parquet"))
                print(f"wrote oracle fixture {sf}/{name}: {len(pdf)} rows")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "corpus":
        import json

        from osmquadtree_bin_spark.datagen import gen_docs
        from osmquadtree_bin_spark.session import get_spark
        from tests.test_corpus_golden import corpus_checksums

        spark = get_spark(app="make-goldens", master="local[4]", shuffle_partitions=4)
        docs = gen_docs(spark, n_docs=300, seed=42)
        sums = corpus_checksums(spark, docs)
        with open(os.path.join(GOLDEN, "corpus.json"), "w") as f:
            json.dump(sums, f, indent=1, sort_keys=True)
        print(f"wrote corpus goldens: {len(sums)} layers")


if __name__ == "__main__":
    main()
