"""T4 as a real custom stateful operator: per-tile pending blocks via
``applyInPandasWithState`` (build brief §streaming: "applyInPandasWithState
for custom stateful operators").

Reference semantics (``/root/reference/osmquadtree-update.go`` pending-block
handling, SURVEY.md §2.10 T4): while replication diffs stream in, rows for a
tile accumulate in a PENDING block; the block seals when the tile sees a
final-state marker (the replication loop reached the target state for that
tile) — only sealed blocks flow to the tiled-store rewrite. In the batch
engine this dissolves into the touched-tile join (``update.apply_diff``);
this module is the long-running streaming rendition where per-tile state
must live ACROSS micro-batches.

State per tile: (n_rows, first_state, last_state) — bounded regardless of
how many replication states pass through (a distinct-state count would need
unbounded per-tile memory; first/last + row count carry the lineage the
ledger needs). Output: one row per sealed block. Arrow-batched per group — no per-row Python.

Timeout mode: a continuously-running deployment passes ``timeout_ms`` so a
tile whose marker never arrives seals with ``closed_by='timeout'`` after the
idle period (ProcessingTimeTimeout). The drain runner
(``run_pending_available``) uses NoTimeout deliberately: with availableNow,
pending processing-time timeouts keep the query scheduling empty
micro-batches forever (observed: 215 epochs before an external kill), so
timeouts only belong to the always-on trigger.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "tile_idx long, n_rows long, first_state long, "
    "last_state long, closed_by string"
)
STATE_SCHEMA = "n_rows long, first_state long, last_state long"
_OUT_COLS = [c.split()[0] for c in OUTPUT_SCHEMA.split(", ")]


def make_pending_block(timeout_ms: int | None = None):
    """Build the per-group stateful kernel. ``timeout_ms`` arms the
    processing-time safety valve (continuous mode only — see module doc)."""

    def pending_block(key, pdf_iter, state: GroupState):
        (tile_idx,) = key
        if state.hasTimedOut:
            n_rows, first_state, last_state = state.get
            state.remove()
            yield pd.DataFrame(
                [[tile_idx, n_rows, first_state, last_state, "timeout"]],
                columns=_OUT_COLS,
            )
            return

        n_rows, first_state, last_state = (
            state.get if state.exists else (0, None, None)
        )
        seal = False
        for pdf in pdf_iter:
            n_rows += int(len(pdf))
            states = pdf["state"]
            lo, hi = int(states.min()), int(states.max())
            first_state = lo if first_state is None else min(first_state, lo)
            last_state = hi if last_state is None else max(last_state, hi)
            if bool(pdf["final"].any()):
                seal = True
        if seal:
            state.remove()
            yield pd.DataFrame(
                [[tile_idx, n_rows, first_state, last_state, "final"]],
                columns=_OUT_COLS,
            )
        else:
            state.update((n_rows, first_state, last_state))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

    return pending_block


def pending_blocks_stream(diffs, timeout_ms: int | None = None):
    """Wire the stateful op over a streaming diff frame with columns
    (tile_idx, state, final). Update mode; per-tile state across batches."""
    return diffs.groupBy("tile_idx").applyInPandasWithState(
        make_pending_block(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_pending_available(
    spark,
    diff_dir: str,
    checkpoint_dir: str,
    schema: str,
    out_dir: str,
    max_files_per_trigger: int = 1,
):
    """Drain the diff directory (one file per micro-batch so state genuinely
    crosses batch boundaries), appending sealed blocks to ``out_dir`` via
    foreachBatch — the only sink kind that is both update-mode-capable and
    checkpoint-recoverable (the memory sink refuses to restart from a
    checkpoint). Unsealed tiles stay in the checkpointed state for the next
    drain — the availableNow counterpart of the always-on timeout. Returns
    the sealed-blocks frame."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(diff_dir)
    )

    def sink(batch_df, _batch_id: int) -> None:
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(out_dir)

    q = (
        pending_blocks_stream(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(OUTPUT_SCHEMA).parquet(out_dir)
