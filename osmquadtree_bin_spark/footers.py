"""Parquet-footer metadata reads for hive-partitioned tile stores.

Per-tile row counts from file footers — the driver-side metadata path that
replaces full distributed count scans for write audits and diff ledgers
(guide §1.2: don't compute things a metadata read already knows). On
Iceberg the same numbers come from one manifest-summary scan; on HDFS/S3
the footers stream through the FS API or the caller falls back to a
distributed count. Callers must treat ``None`` as "fall back", never as
zero.
"""

from __future__ import annotations

import glob
import logging
import os

log = logging.getLogger(__name__)


def tile_rows_from_footers(
    tiled_path: str,
    max_files: int = 50_000,
    tiles: list[int] | None = None,
) -> dict[int, int] | None:
    """Per-tile written row counts from the parquet footers of a local
    hive-partitioned layout (tile_idx=N/ dirs) — a driver-side metadata
    read replacing a full distributed scan of the store. ``tiles`` limits
    the walk to those partitions (diff ledgers only touch a few tiles; the
    full-store walk is for the post-prepare audit). None → caller falls
    back to the Spark count (non-partitioned layout, non-local fs, corrupt
    footer, or more files than a serial driver walk should touch). The
    except clause is narrow on purpose: a corrupt-footer signal must
    surface in the log, not silently vanish into the fallback (r05 ADVICE)."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        if tiles is not None:
            dirs = [
                d
                for t in tiles
                if os.path.isdir(d := os.path.join(tiled_path, f"tile_idx={t}"))
            ]
            if not dirs and tiles:
                return {}
        else:
            dirs = glob.glob(os.path.join(tiled_path, "tile_idx=*"))
            if not dirs:
                return None
        per_dir = {
            int(os.path.basename(d).split("=", 1)[1]): glob.glob(
                os.path.join(d, "*.parquet")
            )
            for d in dirs
        }
        if sum(len(fs) for fs in per_dir.values()) > max_files:
            return None
        return {
            t: sum(pq.read_metadata(f).num_rows for f in fs)
            for t, fs in per_dir.items()
        }
    except (OSError, ValueError, KeyError, pa.ArrowInvalid) as e:
        log.warning(
            "footer walk of %s failed (%s: %s) — falling back to a "
            "distributed count; if this is a corrupt-footer signal it needs "
            "attention, not silence",
            tiled_path,
            type(e).__name__,
            e,
        )
        return None
