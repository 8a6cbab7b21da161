"""§2.10 streaming depth: watermarked windowed aggregation (batch == stream)
and the applyInPandasWithState pending-block operator (T4)."""

import datetime as dt
import os

from pyspark.sql import Row, functions as F

from osmquadtree_bin_spark.streaming.stateful import run_pending_available
from osmquadtree_bin_spark.streaming.windowed import (
    run_windowed_available,
    windowed_event_stats,
)

EVENTS_SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


_MTIME_SEQ = [0]


def _write_flat(spark, schema, path, rows):
    """Write ONE parquet FILE at ``path`` (the file stream source lists flat
    files; a .write.parquet directory under the watched dir is ignored).
    Stamps strictly increasing mtimes: shutil.move preserves the source
    mtime and the file source orders micro-batches by it — same-second
    writes would otherwise tie and break the intended batch order."""
    import glob
    import shutil
    import tempfile
    import time

    d = tempfile.mkdtemp()
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/out"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shutil.move(glob.glob(f"{d}/out/part-*.parquet")[0], path)
    shutil.rmtree(d, ignore_errors=True)
    _MTIME_SEQ[0] += 10
    t = time.time() - 3600 + _MTIME_SEQ[0]
    os.utime(path, (t, t))


def _write_events(spark, path, rows):
    _write_flat(spark, EVENTS_SCHEMA, path, rows)


def test_streaming_windowed_matches_batch(spark, tmp_path):
    """The SAME windowed_event_stats plan run as a stream (watermark, append
    mode, per-file micro-batches) must finalize exactly the batch result for
    every window the watermark has passed."""
    f1 = [
        (0, _ts(0, 5), "click", 1.0),
        (1, _ts(0, 40), "view", 2.5),
        (2, _ts(1, 10), "click", 3.0),
    ]
    f2 = [
        (3, _ts(1, 30), "click", 1.5),
        (4, _ts(2, 20), "view", 4.0),
    ]
    # sentinel far ahead advances the watermark; the watermark computed from
    # batch N's data only takes effect in batch N+1 (Spark updates it at
    # batch end), so a second sentinel batch is needed to flush the seals
    f3 = [(5, _ts(23, 0), "click", 0.25)]
    f4 = [(6, _ts(23, 30), "click", 0.5)]
    events_dir = str(tmp_path / "events")
    _write_events(spark, f"{events_dir}/f1.parquet", f1)
    _write_events(spark, f"{events_dir}/f2.parquet", f2)
    _write_events(spark, f"{events_dir}/f3.parquet", f3)
    _write_events(spark, f"{events_dir}/f4.parquet", f4)

    got = run_windowed_available(
        spark,
        events_dir,
        str(tmp_path / "ckpt_w"),
        EVENTS_SCHEMA,
        max_files_per_trigger=1,
        table_name="win_a",
    ).toPandas()

    batch = spark.createDataFrame(f1 + f2 + f3 + f4, EVENTS_SCHEMA)
    expected = (
        windowed_event_stats(batch)
        .filter(F.col("window_start") < _ts(22, 0))  # sentinel window never seals
        .toPandas()
    )
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    expected = expected.sort_values(key).reset_index(drop=True)
    assert got[key + ["n_events", "value_cents"]].equals(
        expected[key + ["n_events", "value_cents"]]
    ), f"\ngot:\n{got}\nexpected:\n{expected}"


def test_streaming_windowed_drops_late_rows(spark, tmp_path):
    """A straggler arriving after its window was FINALIZED must be dropped —
    the sealed-day guarantee. (Spark's exact semantics: a late row is merged
    if its window state still exists; it is dropped only once the window was
    emitted+evicted, which happens in the first batch whose watermark passed
    the window end. So the straggler must arrive a batch after that one.)"""
    events_dir = str(tmp_path / "events_late")
    _write_events(spark, f"{events_dir}/f1.parquet", [(0, _ts(0, 10), "click", 1.0)])
    # f2 advances max event time; the watermark (12:00 - grace = 10:00)
    # takes effect in f3's batch, which emits + evicts the hour-0 window
    _write_events(spark, f"{events_dir}/f2.parquet", [(1, _ts(12, 0), "click", 1.0)])
    _write_events(spark, f"{events_dir}/f3.parquet", [(2, _ts(13, 0), "click", 1.0)])
    # straggler for hour 0 arrives AFTER the eviction: dropped
    _write_events(spark, f"{events_dir}/f4.parquet", [(3, _ts(0, 20), "click", 9.0)])
    _write_events(spark, f"{events_dir}/f5.parquet", [(4, _ts(23, 0), "click", 1.0)])

    got = run_windowed_available(
        spark,
        events_dir,
        str(tmp_path / "ckpt_late"),
        EVENTS_SCHEMA,
        max_files_per_trigger=1,
        table_name="win_late",
    ).toPandas()
    h0 = got[got.window_start == _ts(0)]
    # exactly one finalized row for hour 0 (no reopened duplicate), without
    # the straggler's 9.0 (900 cents)
    assert len(h0) == 1
    assert int(h0.n_events.iloc[0]) == 1 and int(h0.value_cents.iloc[0]) == 100


def test_pending_blocks_seal_on_final_marker(spark, tmp_path):
    """applyInPandasWithState: per-tile state accumulates ACROSS micro-batches
    and seals exactly when the tile's final marker arrives."""
    schema = "tile_idx long, state long, final boolean"
    d = str(tmp_path / "diffs")

    def w(name, rows):
        _write_flat(spark, schema, f"{d}/{name}", rows)

    # tile 1: rows in batches 1+2, sealed in batch 2; tile 2: sealed batch 1;
    # tile 3: never sealed (no output in update mode before timeout)
    w("b1.parquet", [(1, 10, False), (1, 10, False), (2, 10, True), (3, 10, False)])
    w("b2.parquet", [(1, 11, False), (1, 12, True), (3, 11, False)])

    got = run_pending_available(
        spark, d, str(tmp_path / "ckpt_p"), schema, str(tmp_path / "out_p")
    ).toPandas()
    sealed = got.set_index("tile_idx")
    assert set(sealed.index) == {1, 2}
    t1 = sealed.loc[1]
    assert (
        int(t1.n_rows) == 4
        and int(t1.first_state) == 10
        and int(t1.last_state) == 12
        and t1.closed_by == "final"
    )
    t2 = sealed.loc[2]
    assert int(t2.n_rows) == 1 and t2.closed_by == "final"


def test_pending_blocks_resume_from_checkpoint(spark, tmp_path):
    """State survives a full stop/restart via the checkpoint (S7 role at the
    operator level): rows before the restart still count in the sealed
    block."""
    schema = "tile_idx long, state long, final boolean"
    d = str(tmp_path / "diffs_r")
    ckpt = str(tmp_path / "ckpt_r")

    def w(name, rows):
        _write_flat(spark, schema, f"{d}/{name}", rows)

    out = str(tmp_path / "out_r")
    w("b1.parquet", [(7, 1, False), (7, 2, False)])
    got1 = run_pending_available(spark, d, ckpt, schema, out).toPandas()
    assert len(got1) == 0  # nothing sealed yet
    w("b2.parquet", [(7, 3, True)])
    got2 = run_pending_available(spark, d, ckpt, schema, out).toPandas()
    assert len(got2) == 1
    r = got2.iloc[0]
    assert int(r.n_rows) == 3 and int(r.first_state) == 1 and int(r.last_state) == 3


def test_pending_block_timeout_branch():
    """Continuous-mode safety valve: a timed-out tile seals with
    closed_by='timeout' and its state is removed (pure-Python kernel test —
    availableNow deliberately runs with NoTimeout, see stateful.py)."""
    from osmquadtree_bin_spark.streaming.stateful import make_pending_block

    class FakeState:
        hasTimedOut = True
        exists = True
        get = (5, 10, 12)
        removed = False

        def remove(self):
            self.removed = True

    st = FakeState()
    out = list(make_pending_block(timeout_ms=60_000)((7,), iter([]), st))
    assert st.removed and len(out) == 1
    row = out[0].iloc[0]
    assert (
        int(row.tile_idx) == 7
        and int(row.n_rows) == 5
        and int(row.last_state) == 12
        and row.closed_by == "timeout"
    )
