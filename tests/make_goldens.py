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


if __name__ == "__main__":
    main()
