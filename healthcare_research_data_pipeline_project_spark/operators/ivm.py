"""Incremental view maintenance for additive aggregate views.

At 100 TB, recomputing `SELECT keys, COUNT(*), SUM(m)...` over the
full fact table for every refresh is the single most expensive
periodic job a warehouse runs; the standard fix is delta maintenance:
aggregate only the CHANGE set, then merge the per-key partials into
the stored view. That works exactly for the self-maintainable
(additive) aggregates — COUNT and SUM under inserts AND deletes
(a delete is a −1/−value contribution), with AVG derived as
sum/count at read time. MIN/MAX are deliberately NOT supported: they
are not self-maintainable under deletes (losing the current min
forces a rescan), and a silent wrong answer is worse than an explicit
recompute.

Storage protocol: `view_path` is a versioned root in the
`operators/versioned.py` manifest-pointer layout — immutable
`v=<n>/` parquet directories holding (keys..., __cnt, __sum_<m>...)
plus a tiny `_latest.json` manifest written via tmp + `os.rename`.
A refresh writes the fully-merged next version (data AND its
exactly-once batch ledger) BEFORE the one atomic manifest rename, so
a crash at any point leaves the previous version current and readers
never observe a missing or partial view; superseded versions are
expired after the flip. The merge is one shuffle on the
view key for the delta partials plus a key-partitioned outer join
against the stored view — delta-sized work, never base-table-sized.

Reference parity: the reference recomputes its aggregate endpoints
from the RDBMS on every call (healthcare-api-main.py:471-545); this
operator is what replaces those full scans when the fact table no
longer fits a single Postgres.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .versioned import _manifest_path, current_version


def _sum_cols(measures: list[str]) -> list[str]:
    return [f"__sum_{m}" for m in measures]


def _hll_cols(distinct_cols: list[str] | None) -> list[str]:
    return [f"__hll_{c}" for c in (distinct_cols or [])]


def _merge_hll(stored, delta):
    """NULL-safe DataSketches HLL union: a key seen only on one side
    keeps that side's sketch (hll_union propagates NULL otherwise)."""
    return (
        F.when(stored.isNull(), delta)
        .when(delta.isNull(), stored)
        .otherwise(F.hll_union(stored, delta))
    )


def _data_dir(view_path: str, version: int) -> str:
    return os.path.join(view_path.rstrip("/"), f"v={version}")


def _current_data_dir(view_path: str) -> str:
    v = current_version(view_path)
    if v < 1:
        raise FileNotFoundError(f"{view_path}: view not initialized")
    return _data_dir(view_path, v)


def _commit_version(
    df: DataFrame,
    view_path: str,
    batch_id: int | str | None = None,
) -> str:
    """Publish `df` as the next view version. The data directory —
    including the carried-forward batch ledger when `batch_id` is set —
    is FULLY written before the single atomic manifest rename, so the
    ledger and the data commit together (the exactly-once guarantee)
    and a crash at any point leaves the previous version current.

    Concurrent refreshes are SERIALIZED by an O_CREAT|O_EXCL lockfile
    held across the whole allocate→write→rename→expire sequence: the
    `errorifexists` write alone is not enough (writer A could allocate
    v, writer B commit v+1 and expire v, then A's later manifest
    rename would both lose B's update and point readers at the deleted
    v). A second committer finds the lock and raises immediately; a
    crash mid-commit leaves the lockfile behind, and the raise names
    it so an operator can remove the stale lock after verifying no
    refresh is live (the manifest-pointer protocol itself guarantees
    the crashed attempt was never visible). As a belt the manifest is
    re-read under the lock right before the rename and the commit
    aborts if another writer moved it. Retention after the flip keeps
    the immediately-previous served version alongside the new one
    (keep_last=2): a lazy DataFrame handed out by `read_agg_view`/
    `refresh_agg_view` before this flip still resolves its files
    through one subsequent refresh. Everything older — and any crashed
    uncommitted attempt below the previous version, which no reader
    could ever have resolved — is removed; versions NEWER than this
    commit are never expired."""
    root = view_path.rstrip("/")
    os.makedirs(root, exist_ok=True)
    lock = os.path.join(root, "_commit.lock")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"{root}: another refresh holds the commit lock ({lock}); "
            "view commits are serialized — wait for it, or remove the "
            "lockfile if its writer crashed (the crashed attempt was "
            "never visible to readers)"
        ) from None
    try:
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        prev = current_version(root)
        leftover = [
            int(n.split("=", 1)[1])
            for n in os.listdir(root)
            if n.startswith("v=")
        ]
        v = max([prev, *leftover], default=prev) + 1
        ddir = _data_dir(root, v)
        df.write.mode("errorifexists").parquet(ddir)
        if batch_id is not None:
            _ledger_copy_into(root, ddir, batch_id)
        if current_version(root) != prev:  # belt: manifest moved under us
            shutil.rmtree(ddir, ignore_errors=True)
            raise RuntimeError(
                f"{root}: manifest advanced past v={prev} during this "
                "commit (a concurrent writer bypassed the lock); "
                "aborting without publishing"
            )
        tmp = _manifest_path(root) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": v}, f)
        os.rename(tmp, _manifest_path(root))  # the atomic commit point
        for name in os.listdir(root):  # expire all but {prev, v}
            if name.startswith("v="):
                k = int(name.split("=", 1)[1])
                if k < v and k != prev:
                    shutil.rmtree(
                        os.path.join(root, name), ignore_errors=True
                    )
    finally:
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass
    return ddir


def init_agg_view(
    base: DataFrame,
    view_path: str,
    keys: list[str],
    measures: list[str],
    distinct_cols: list[str] | None = None,
) -> DataFrame:
    """Materialize the initial view: one full aggregation of `base`
    (the only base-sized job in the view's lifetime). Re-initializing
    an existing view commits a fresh version with an empty ledger.

    `distinct_cols` adds MERGEABLE approx-distinct measures: the view
    stores a DataSketches HLL sketch per (key, col) — a fixed-size
    binary — and each refresh UNIONs the delta batch's sketch partial
    into it. This is how distinct counting stays incrementally
    maintainable at 100 TB: the exact alternative (a distinct-keys
    side table) grows with cardinality, while the sketch is O(2^lgK)
    bytes per key forever. Insert-only by construction — HLL cannot
    subtract (see refresh_agg_view)."""
    aggs = (
        [F.count(F.lit(1)).cast("long").alias("__cnt")]
        + [
            F.sum(F.col(m).cast("decimal(38,6)")).alias(c)
            for m, c in zip(measures, _sum_cols(measures))
        ]
        + [
            F.hll_sketch_agg(c).alias(h)
            for c, h in zip(distinct_cols or [], _hll_cols(distinct_cols))
        ]
    )
    ddir = _commit_version(base.groupBy(*keys).agg(*aggs), view_path)
    return base.sparkSession.read.parquet(ddir)


def refresh_agg_view(
    spark: SparkSession,
    view_path: str,
    delta: DataFrame,
    keys: list[str],
    measures: list[str],
    op_col: str | None = None,
    batch_id: int | str | None = None,
    distinct_cols: list[str] | None = None,
) -> DataFrame:
    """Merge a change batch into the stored view.

    `delta` rows are inserts, unless `op_col` names a column with
    'I'/'D' markers (CDC feed): deletes contribute −1/−value. Keys
    whose count reaches 0 leave the view. Work is delta-sized: one
    aggregation of the batch + an outer merge on the view key.

    `batch_id` enables exactly-once semantics under at-least-once
    redelivery (foreachBatch retries, replayed CDC segments): applied
    ids live as marker files INSIDE the view directory, committed by
    the same rename that publishes the merged data, so a redelivered
    batch finds its id and no-ops instead of double-applying.
    """
    if distinct_cols and op_col:
        # HLL sketches are insert-only (a union can never forget an
        # element); silently keeping a deleted element in the distinct
        # estimate while the counts shrink would be a wrong answer, so
        # the combination is rejected — same doctrine as MIN/MAX
        raise ValueError(
            "distinct_cols cannot be maintained under deletes (op_col): "
            "HLL sketches are insert-only"
        )
    if batch_id is not None and _ledger_has(view_path, batch_id):
        return spark.read.parquet(_current_data_dir(view_path))
    sign = (
        F.when(F.col(op_col) == "D", F.lit(-1)).otherwise(F.lit(1))
        if op_col
        else F.lit(1)
    )
    scols = _sum_cols(measures)
    hcols = _hll_cols(distinct_cols)
    partial = delta.groupBy(*keys).agg(
        F.sum(sign).cast("long").alias("__d_cnt"),
        *[
            F.sum(sign * F.col(m).cast("decimal(38,6)")).alias(f"__d_{c}")
            for m, c in zip(measures, scols)
        ],
        *[
            F.hll_sketch_agg(c).alias(f"__d_{h}")
            for c, h in zip(distinct_cols or [], hcols)
        ],
    )
    cur_dir = _current_data_dir(view_path)
    old = spark.read.parquet(cur_dir)
    # the stored schema IS the view definition — refreshing with
    # different keys/measures/distinct_cols would silently project
    # away maintained columns (e.g. drop the __hll_* sketches and
    # destroy the distinct estimates), so any mismatch is an error
    stored = set(old.columns)
    want = set(keys) | {"__cnt"} | set(scols) | set(hcols)
    if stored != want:
        raise ValueError(
            f"{view_path}: refresh arguments do not match the stored view "
            f"schema (stored-but-unrequested: {sorted(stored - want)}; "
            f"requested-but-missing: {sorted(want - stored)}) — pass the "
            "same keys/measures/distinct_cols the view was initialized with"
        )
    # null-safe key equality: a NULL grouping key is one group in the
    # aggregation, so it must be ONE row in the merge too (plain `=`
    # never matches NULLs and would fork a duplicate null-key row per
    # refresh)
    pren = partial.select(
        *[F.col(k).alias(f"__p_{k}") for k in keys],
        "__d_cnt",
        *[F.col(f"__d_{c}") for c in _sum_cols(measures)],
        *[F.col(f"__d_{h}") for h in hcols],
    )
    cond = None
    for k in keys:
        c_eq = old[k].eqNullSafe(pren[f"__p_{k}"])
        cond = c_eq if cond is None else (cond & c_eq)
    merged = (
        old.join(pren, cond, "full_outer")
        .select(
            *[
                F.coalesce(old[k], pren[f"__p_{k}"]).alias(k)
                for k in keys
            ],
            (
                F.coalesce("__cnt", F.lit(0))
                + F.coalesce("__d_cnt", F.lit(0))
            ).alias("__cnt"),
            *[
                (
                    F.coalesce(F.col(c), F.lit(0).cast("decimal(38,6)"))
                    + F.coalesce(F.col(f"__d_{c}"), F.lit(0).cast("decimal(38,6)"))
                ).alias(c)
                for c in scols
            ],
            *[
                _merge_hll(old[h], F.col(f"__d_{h}")).alias(h)
                for h in hcols
            ],
        )
        .filter(F.col("__cnt") > 0)
    )
    # manifest-pointer commit: the merged data AND its ledger are fully
    # written into the next immutable v=<n> dir before one atomic
    # manifest rename flips readers over — no window where the view is
    # missing, and the exactly-once ledger commits with its data
    ddir = _commit_version(merged, view_path, batch_id=batch_id)
    return spark.read.parquet(ddir)


_LEDGER = "_applied_batches"


def _ledger_has(view_path: str, batch_id: int | str) -> bool:
    v = current_version(view_path)
    if v < 1:
        return False
    return os.path.exists(
        os.path.join(_data_dir(view_path, v), _LEDGER, str(batch_id))
    )


def _ledger_copy_into(
    view_path: str, new_data_dir: str, batch_id: int | str
) -> None:
    """Carry the current version's ledger into the about-to-be-committed
    version dir and add this batch's marker (empty files — O(batches)
    names, compactable by retention). Runs BEFORE the manifest flip, so
    ledger and data commit atomically together."""
    dst = os.path.join(new_data_dir.rstrip("/"), _LEDGER)
    os.makedirs(dst, exist_ok=True)
    v = current_version(view_path)
    if v >= 1:
        src = os.path.join(_data_dir(view_path, v), _LEDGER)
        if os.path.isdir(src):
            for name in os.listdir(src):
                open(os.path.join(dst, name), "a").close()
    open(os.path.join(dst, str(batch_id)), "a").close()


def read_agg_view(
    spark: SparkSession,
    view_path: str,
    measures: list[str],
    avg_scale: int = 6,
    distinct_cols: list[str] | None = None,
) -> DataFrame:
    """Serve the view with derived averages: (keys..., cnt,
    sum_<m>, avg_<m>). AVG comes from the maintained sum/count, so it
    is exactly the full-recompute average at every refresh point.
    `distinct_cols` views additionally serve `approx_distinct_<c>`
    from the maintained HLL sketch — identical to the estimate a
    one-shot `hll_sketch_agg` over all inserted rows would produce
    (sketch union is lossless at a fixed lgConfigK)."""
    v = spark.read.parquet(_current_data_dir(view_path))
    out = v.withColumnRenamed("__cnt", "cnt")
    for m, c in zip(measures, _sum_cols(measures)):
        out = out.withColumn(f"sum_{m}", F.col(c).cast("double")).withColumn(
            f"avg_{m}",
            F.round(
                (F.col(c) / F.col("cnt")).cast("double"), avg_scale
            ),
        ).drop(c)
    for c, h in zip(distinct_cols or [], _hll_cols(distinct_cols)):
        out = out.withColumn(
            f"approx_distinct_{c}", F.hll_sketch_estimate(F.col(h))
        ).drop(h)
    return out


def maintain_view_stream(
    delta_stream: DataFrame,
    view_path: str,
    keys: list[str],
    measures: list[str],
    op_col: str | None = None,
    checkpoint_dir: str | None = None,
    distinct_cols: list[str] | None = None,
):
    """Continuous view maintenance: drive `refresh_agg_view` from a
    Structured Streaming CDC feed via `foreachBatch` — each micro-batch
    is one delta merge, so the view converges to the batch aggregate of
    everything streamed (pinned by the stream-vs-batch test).

    foreachBatch is the right tool here (not a streaming aggregation):
    the merge needs to read and atomically replace an external parquet
    view, which is a batch-side effect per micro-batch, exactly the
    contract foreachBatch exists for. Checkpointing makes redelivery
    at-least-once; the per-batch ledger inside `refresh_agg_view`
    (batch_id passed from foreachBatch) upgrades that to exactly-once:
    a redelivered micro-batch finds its id already committed and
    no-ops.

    Returns the started StreamingQuery (availableNow-compatible)."""
    spark = delta_stream.sparkSession

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        refresh_agg_view(
            spark, view_path, batch_df, keys, measures, op_col=op_col,
            batch_id=_batch_id, distinct_cols=distinct_cols,
        )

    writer = delta_stream.writeStream.foreachBatch(_merge).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


# ---------------------------------------------------------------------------
# Join-view delta rule (insert-only)
# ---------------------------------------------------------------------------
def join_view_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str] | F.Column,
) -> DataFrame:
    """The incremental-maintenance counterpart for an INNER-JOIN view
    V = A ⋈ B under insert-only deltas: the view's change set is

        ΔV = (ΔA ⋈ B_new) ∪ (A_old ⋈ ΔB),   B_new = B_old ∪ ΔB

    — the standard delta rule with ΔA⋈ΔB folded into the first term
    so no pair is produced twice. The defining scale property: the
    base-sized product A_old ⋈ B_old is NEVER recomputed — each term
    has a delta on one side, so refresh work is delta-proportional.
    When ΔB is dimension-delta-sized (the overwhelmingly common case:
    a few new customers against a petabyte fact), broadcast it at the
    call site and the A_old term becomes a map-side scan with no
    exchange at all. Deletes are deliberately NOT supported here —
    join views under deletes need per-row multiplicity counting
    (the counting algorithm), a different storage contract from this
    repo's insert-only versioned views; a silent wrong answer is
    worse than an explicit recompute (same doctrine as MIN/MAX in the
    aggregate views above)."""
    b_new = b_old.unionByName(b_delta)
    return a_delta.join(b_new, on).unionByName(a_old.join(b_delta, on))
