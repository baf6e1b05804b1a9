"""Executing small-file compaction — the reference's own remediation,
applied (advisor-executing pattern #10).

The reference DIAGNOSES small-file debt and SIMULATES the 750 MiB
check-before-append remediation per partition
(``icebergdiag/metrics/table_metrics.py:111-155,179-197``): bin-pack
each partition's DATA file sizes, report predicted after_file_count /
after_scan_overhead, and the improvement ratio. It never rewrites a
byte. ``sinks.compact_write`` rewrites, but only to a uniform size
target — not the plan the diagnostics priced. This module closes the
loop: EXECUTE the exact group plan A9 produces (one physical output
file per bin-pack group, ``binpack.pack_sizes`` semantics,
``binpack.py:43-60``), surgically (a partition whose plan shows no
file-count reduction is never read twice, never rewritten — its
bytes on disk stay identical, the retraction-sink discipline), then
re-derive the diagnostics FROM THE WRITTEN FILES so predicted-after
is checked against measured-after instead of trusted.

Scale shape (100 TB):
- Pack decisions run on file METADATA (one row per file — the
  Iceberg ``.files`` relation in production, a per-file aggregate of
  the data here), never on data rows: the assignment applyInPandas
  shuffles #files rows, not the table.
- The data-side rewrite is ONE partition-pruned scan of the affected
  partitions, one join against the file→group assignment (metadata
  scale, stats-driven — no broadcast hint; Catalyst broadcasts it at
  test scale and is free to shuffle at 1e8-file scale), one
  repartition on (partition, group) — each group lands wholly in one
  task, so partitionBy emits exactly ONE file per group — and one
  dynamic-partition-overwrite write, followed by dropping the stale
  leaf dirs the smaller layout no longer uses (write-then-delete: a
  crash in between leaves recoverable duplicates, never loss).
  Untouched partitions are never opened.
- The ledger re-reads ONLY the rewritten partitions (pruned
  predicate); untouched partitions' after-state IS their
  before-state from the pre-pass over the same bytes (per-partition
  digests and counts vouch, the release_retraction_apply idiom).
- Bounded driver state: one collect of per-partition decision rows
  (#partitions, metadata scale), exactly like the retraction sink.
- Staging cost: the rows being rewritten are eagerly localCheckpoint'd
  before the write (you cannot overwrite parquet you are lazily still
  reading) — the same staging copy the retraction sink pays, but
  scoped to ALL affected partitions at once, so a whole-table
  compaction stages the whole table. At that scale, run the sink over
  partition batches (``compact_apply_binpack(..., partitions=[...])``
  scopes the scan, plan, rewrite, AND staging copy to the batch;
  everything outside is never read) or stage to a sibling directory
  and swap.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from iceberg_diag_spark.functions.cost import (
    MAX_GROUP_BYTE_SIZE,
    read_file_cost,
)

ASSIGN_SCHEMA = "partition_key string, file_id long, gid long"

LEDGER_COLUMNS = [
    "partition_key",
    "files_before",
    "rows_before",
    "size_before",
    "scan_overhead_before",
    "groups_planned",
    "scan_overhead_planned",
    "compacted",
    "files_after",
    "rows_after",
    "size_after",
    "scan_overhead_after",
    "members_xor_after",
    "members_xor2_after",
]


def binpack_assign(
    file_sizes: DataFrame,
    partition_col: str = "partition_key",
    file_col: str = "file_id",
    size_col: str = "logical_size",
    max_bytes_per_group: int = MAX_GROUP_BYTE_SIZE,
) -> DataFrame:
    """File → bin-pack group assignment: WHICH group each file lands
    in, not just the group profile ``binpack_groups`` emits.

    Same fold as ``pack_sizes`` (check-before-append, ascending,
    ``binpack.py:43-60``) with a (size, file_id) tie-break so
    membership is deterministic under any input order; the group
    (count, total) profile is tie-invariant and equals pack_sizes'
    (property-pinned in tests). Input is file metadata — one row per
    file — so the grouped pandas fold is metadata-scale, parallel
    across partitions exactly like binpack_groups.
    """

    def _assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([size_col, file_col], kind="mergesort")
        gids = []
        gid = 0
        total = 0
        for s in pdf[size_col]:
            if total > max_bytes_per_group:
                gid += 1
                total = 0
            gids.append(gid)
            total += int(s)
        return pd.DataFrame(
            {
                partition_col: pdf[partition_col],
                file_col: pdf[file_col],
                "gid": gids,
            }
        )

    cols = file_sizes.select(partition_col, file_col, size_col)
    return cols.groupBy(partition_col).applyInPandas(
        _assign,
        schema=f"{partition_col} string, {file_col} long, gid long",
    )


def physical_file_sizes(
    spark: SparkSession, path: str, partition_col: str, file_col: str
) -> DataFrame:
    """(partition, file, size_in_bytes, n_phys) from a recursive
    Hadoop FS listing of a two-level Hive layout
    ``{partition_col}=P/{file_col}=K/part-*.parquet``.

    Test/driver-scale helper: on a production Iceberg table this
    relation is the ``.files`` metadata table (SURVEY §2 S4) — never
    a filesystem walk. The listing is driver-side but file-count
    (metadata) scale, and works on any Hadoop filesystem.
    """
    from urllib.parse import unquote

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    agg: dict[tuple[str, int], list[int]] = {}
    it = fs.listFiles(jpath, True)
    p_tag, f_tag = f"{partition_col}=", f"{file_col}="
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not st.isFile() or name.startswith(("_", ".")):
            continue
        part = file_id = None
        for seg in st.getPath().toString().split("/"):
            if seg.startswith(p_tag):
                # Hive %XX-escapes special chars in partition dir
                # names; the Spark read returns the UNescaped value,
                # so parse back to it or the metadata join misses.
                part = unquote(seg[len(p_tag):])
            elif seg.startswith(f_tag):
                file_id = int(seg[len(f_tag):])
        if part is None or file_id is None:
            continue
        cur = agg.setdefault((part, file_id), [0, 0])
        cur[0] += int(st.getLen())
        cur[1] += 1
    return spark.createDataFrame(
        [(p, f, s, n) for (p, f), (s, n) in sorted(agg.items())],
        f"{partition_col} string, {file_col} long, size_in_bytes long,"
        " n_phys long",
    )


def _leaf_dirs(
    spark: SparkSession,
    path: str,
    partition_col: str | None,
    file_col: str,
) -> list[tuple[str | None, int, str]]:
    """(unescaped partition value, file id, real directory URI) for
    every ``{partition_col}=P/{file_col}=K`` leaf under ``path`` (or
    every root-level ``{file_col}=K`` dir when partition_col is None)
    — the safe way to DELETE layout dirs: interpolating an unescaped
    partition value into a path string misses any Hive-escaped dir
    name, so deletions are driven by the listing instead. Driver-side
    but directory-count (metadata) scale."""
    from urllib.parse import unquote

    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    f_tag = f"{file_col}="
    if partition_col is None:
        for fst in fs.listStatus(root):
            fname = fst.getPath().getName()
            if fst.isDirectory() and fname.startswith(f_tag):
                out.append(
                    (None, int(fname[len(f_tag):]), fst.getPath().toString())
                )
        return out
    p_tag = f"{partition_col}="
    for pst in fs.listStatus(root):
        pname = pst.getPath().getName()
        if not pst.isDirectory() or not pname.startswith(p_tag):
            continue
        pval = unquote(pname[len(p_tag):])
        for fst in fs.listStatus(pst.getPath()):
            fname = fst.getPath().getName()
            if fst.isDirectory() and fname.startswith(f_tag):
                out.append(
                    (pval, int(fname[len(f_tag):]), fst.getPath().toString())
                )
    return out


def compact_apply_binpack(
    spark: SparkSession,
    path: str,
    read_schema: str,
    row_size: Column,
    key: Column,
    partition_col: str = "partition_key",
    file_col: str = "file_id",
    order_cols: tuple[str, ...] = (),
    file_sizes: DataFrame | None = None,
    max_bytes_per_group: int = MAX_GROUP_BYTE_SIZE,
    partitions: list[str] | None = None,
) -> DataFrame:
    """Execute the bin-pack compaction plan against the layout at
    ``path`` and return a per-partition predicted-vs-measured ledger.
    ``partitions`` restricts the whole call (scan, plan, rewrite,
    ledger) to that batch of partition values — the staging-cost
    lever from the module docstring; everything outside the batch is
    never read, never written.

    The layout is ``{partition_col}=P/{file_col}=K`` Hive dirs — one
    physical file per (partition, file) leaf, the write discipline of
    every sink here. ``read_schema`` is explicit per the fileless-dir
    lesson (schema inference dies on an empty partition dir).

    File sizes driving the plan: ``file_sizes`` (partition, file,
    size_in_bytes) when given — REAL bytes from
    ``physical_file_sizes`` or the Iceberg ``.files`` relation, in
    which case the measured after-overhead comes from a fresh
    post-write listing — else the per-file sum of ``row_size`` (a
    logical per-row byte estimate), which keeps the whole ledger
    cross-engine checkable: every output column is then a
    deterministic function of the table rows, so a DuckDB oracle can
    predict what the engine MEASURES from disk. A hash-green row
    certifies the physical rewrite, not just the plan: files_after
    counts real post-write files (input_file_name), and the
    membership digests are re-aggregated from the rewritten bytes.

    Execution (per the module docstring's scale shape): ONE pre-pass
    scan aggregates per-file stats + digests, the assignment fold
    runs on that metadata, partitions whose plan shows no reduction
    (groups == files) are LEFT ON DISK UNTOUCHED, and the rest are
    rewritten one-file-per-group via repartition(partition, gid) +
    partitionBy — then re-read, partition-pruned, for the measured
    after-state. Re-running CONVERGES rather than replays as a no-op:
    every closed group's total already exceeds the cap, but a
    partition's LAST group may be under-cap and re-merge with one
    neighbor on the next pass (check-before-append admits it), so a
    re-run can reduce the file count once more; within two further
    passes every file exceeds the cap or stands alone and the layout
    is a fixed point (convergence pytest-pinned).

    Output: one row per partition, ``LEDGER_COLUMNS`` — before
    (files/rows/bytes/scan-overhead), planned (groups + predicted
    overhead under the reference cost model, ``read_file_cost``),
    and measured-after (real file count, re-read rows/bytes/digests;
    untouched partitions vouched by the pre-pass), ordered by
    partition. scan_overhead_* columns use the SAME size basis the
    plan used, so predicted-vs-measured is apples-to-apples.
    """
    from iceberg_diag_spark.operators.sampling import membership_checksums
    from iceberg_diag_spark.sources.sinks import delete_paths

    if max_bytes_per_group <= 0:
        raise ValueError("max_bytes_per_group must be positive")
    pre = spark.read.schema(read_schema).parquet(path)
    if partitions is not None:
        if not partitions:
            raise ValueError("partitions batch must be non-empty")
        pre = pre.filter(F.col(partition_col).isin(list(partitions)))
    x1, x2 = membership_checksums(key)

    def _per_file_stats(rel: DataFrame) -> DataFrame:
        # input_file_name is non-deterministic for the analyzer —
        # project it before aggregating over it.
        return (
            rel.withColumn("_phys_file", F.input_file_name())
            .groupBy(partition_col, file_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(row_size).cast("long").alias("row_bytes"),
                F.countDistinct("_phys_file").cast("long").alias("n_phys"),
                x1.alias("x1"),
                x2.alias("x2"),
            )
        )

    # ONE scan: per-file stats + per-partition digests. Eager — every
    # downstream decision must not re-read files the rewrite replaces.
    per_file = _per_file_stats(pre).localCheckpoint(eager=True)
    if file_sizes is not None:
        meta = file_sizes.select(
            partition_col, file_col, F.col("size_in_bytes").alias("fsz")
        )
        # A file ON DISK but missing from the caller's metadata must
        # abort, not silently drop: an inner join would exclude it
        # from the plan AND from `kept`, so the rewrite would destroy
        # its rows while every ledger digest stays green (stale
        # .files snapshot = data loss). The check is metadata-scale.
        uncovered = (
            per_file.join(meta, [partition_col, file_col], "left_anti")
            .select(partition_col, file_col)
            .limit(5)
            .collect()
        )
        if uncovered:
            raise ValueError(
                "file_sizes does not cover the layout on disk — "
                "refusing to plan a rewrite from stale metadata; "
                "first uncovered files: "
                + ", ".join(
                    f"({r[partition_col]}, {r[file_col]})" for r in uncovered
                )
            )
        sized = per_file.join(
            meta, [partition_col, file_col]
        ).localCheckpoint(eager=True)
    else:
        sized = per_file.withColumn("fsz", F.col("row_bytes"))

    asg = binpack_assign(
        sized.select(
            partition_col, file_col, F.col("fsz").alias("logical_size")
        ),
        partition_col=partition_col,
        file_col=file_col,
        max_bytes_per_group=max_bytes_per_group,
    )
    withg = sized.join(asg, [partition_col, file_col])
    per_group = withg.groupBy(partition_col, "gid").agg(
        F.sum("fsz").alias("gsz")
    )
    plan = (
        withg.groupBy(partition_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("files_before"),
            F.sum("n_phys").cast("long").alias("phys_before"),
            F.sum("n_rows").cast("long").alias("rows_before"),
            F.sum("row_bytes").cast("long").alias("size_before"),
            F.sum(read_file_cost(F.col("fsz")))
            .cast("long")
            .alias("scan_overhead_before"),
            F.countDistinct("gid").cast("long").alias("groups_planned"),
            F.bit_xor("x1").alias("bx1"),
            F.bit_xor("x2").alias("bx2"),
        )
        .join(
            per_group.groupBy(partition_col).agg(
                F.sum(read_file_cost(F.col("gsz")))
                .cast("long")
                .alias("scan_overhead_planned")
            ),
            partition_col,
        )
        .localCheckpoint(eager=True)
    )

    # Decision rows: metadata-bounded collect (#partitions), the
    # retraction sink's discipline. The decision compares groups
    # against the PHYSICAL file count (what the ledger reports and
    # the cost model prices): a leaf dir holding two physical files
    # still shrinks when merged even if its logical file count
    # equals the group count.
    decisions = plan.select(
        partition_col, "phys_before", "groups_planned"
    ).collect()
    groups_of = {
        r[partition_col]: int(r["groups_planned"])
        for r in decisions
        if r["groups_planned"] < r["phys_before"]
    }
    todo = list(groups_of)
    if todo:
        n_groups = sum(groups_of.values())
        data_cols = [
            f.name
            for f in pre.schema.fields
            if f.name not in (partition_col, file_col)
        ]
        kept = (
            pre.filter(F.col(partition_col).isin(todo))
            .join(asg, [partition_col, file_col])
            .select(
                *data_cols,
                F.col("gid").cast("long").alias(file_col),
                partition_col,
            )
            .localCheckpoint(eager=True)  # the write replaces its input
        )
        # Write FIRST via dynamic partition overwrite (gids are
        # contiguous 0..k-1 and every group is non-empty, so exactly
        # those leaf dirs are replaced), THEN drop the stale leaf
        # dirs the smaller layout no longer uses — the retraction
        # sink's order: a crash in between leaves recoverable
        # duplicates, never a deleted-but-unwritten partition.
        (
            kept.repartition(max(1, int(n_groups)), partition_col, file_col)
            .sortWithinPartitions(partition_col, file_col, *order_cols)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col, file_col)
            .parquet(path)
        )
        # Stale-dir drops are driven by a real directory listing, not
        # by interpolating partition values into path strings — a
        # Hive-escaped dir name (':', '%', '=', ... in the value)
        # would never match an interpolated path and the stale files
        # would double-count in the after-state. Deletes batch
        # through one FS handle + thread pool (delete_paths): ~300
        # serial py4j/FS calls cost ~1.5 s locally and worse on an
        # object store.
        delete_paths(
            spark,
            [
                uri
                for pval, fid, uri in _leaf_dirs(
                    spark, path, partition_col, file_col
                )
                if pval in groups_of and fid >= groups_of[pval]
            ],
        )

    # Measured after-state: rewritten partitions re-read FROM THE
    # WRITTEN FILES (pruned); untouched partitions reuse the pre-pass
    # row — same bytes on disk, byte-identity pytest-pinned.
    untouched = plan
    if todo:
        untouched = plan.filter(~F.col(partition_col).isin(todo))
    after = untouched.select(
        partition_col,
        F.col("phys_before").alias("files_after"),
        F.col("rows_before").alias("rows_after"),
        F.col("size_before").alias("size_after"),
        F.col("scan_overhead_before").alias("scan_overhead_after"),
        F.col("bx1").alias("members_xor_after"),
        F.col("bx2").alias("members_xor2_after"),
    )
    if todo:
        post = _per_file_stats(
            spark.read.schema(read_schema)
            .parquet(path)
            .filter(F.col(partition_col).isin(todo))
        )
        if file_sizes is not None:
            relisted = physical_file_sizes(
                spark, path, partition_col, file_col
            ).filter(F.col(partition_col).isin(todo))
            post = post.join(
                relisted.select(
                    partition_col,
                    file_col,
                    F.col("size_in_bytes").alias("fsz"),
                ),
                [partition_col, file_col],
            )
        else:
            post = post.withColumn("fsz", F.col("row_bytes"))
        measured = post.groupBy(partition_col).agg(
            F.sum("n_phys").cast("long").alias("files_after"),
            F.sum("n_rows").cast("long").alias("rows_after"),
            F.sum("row_bytes").cast("long").alias("size_after"),
            F.sum(read_file_cost(F.col("fsz")))
            .cast("long")
            .alias("scan_overhead_after"),
            F.bit_xor("x1").alias("members_xor_after"),
            F.bit_xor("x2").alias("members_xor2_after"),
        )
        after = after.unionByName(measured)

    return (
        plan.select(
            partition_col,
            F.col("phys_before").alias("files_before"),
            "rows_before",
            "size_before",
            "scan_overhead_before",
            "groups_planned",
            "scan_overhead_planned",
            (F.col("groups_planned") < F.col("phys_before")).alias(
                "compacted"
            ),
        )
        .join(after, partition_col)
        .orderBy(partition_col)
    )


def cluster_apply_sorted(
    spark: SparkSession,
    path: str,
    read_schema: str,
    value_col: str,
    key_col: str,
    file_col: str = "file_id",
    rows_per_file: int = 4096,
) -> DataFrame:
    """Execute the sort-order remediation the skip diagnostics only
    price, and return a one-row predicted-vs-measured ledger.

    clustering_advisor ranks WHICH column a sort-order rewrite should
    target and skip_simulation prices it (the reference's
    before/after-improvement idiom applied to data skipping);
    sinks.sorted_rewrite performs A sorted rewrite — but via
    repartitionByRange's sampled boundaries, which no closed form can
    predict and no hash oracle can check. This sink instead
    materializes EXACTLY the layout the simulation models: rows in
    global ``value_col`` order, chunked ``rows_per_file`` per file —
    so the simulation's closed-form after-stats are the PREDICTION
    and the endpoint sweep over the WRITTEN files' min/max bounds is
    the MEASUREMENT, equal when and only when the rewrite did what
    the model says.

    Distributed ranking (no global single-task window, SCALING §4):
    per-value counts → grouped_prefix_sum gives each value's starting
    rank; a per-value row_number (window bounded by the duplicate
    count of one value — the same ceiling the simulation's model
    already has: a hot low-cardinality value makes rank order within
    it arbitrary AND its window big; pick high-cardinality sort
    columns) finishes the total order. The rewrite joins rows to the
    value-rank base (value-cardinality scale, stats-driven, no hint),
    repartitions on the target file id — one task per file, one
    physical file per leaf dir — and lands via dynamic partition
    overwrite + stale-leaf-dir drop (the compact_apply_binpack
    ordering: duplicates on crash, never loss). A global re-sort
    rewrites every file by nature — there is no untouched-partition
    shortcut here; the after-state is re-read entirely from the
    written files (bounds, rows, digests), and the pre-write staging
    checkpoint is likewise the whole table (the unavoidable copy of
    any overwrite-what-you-read rewrite; range-partition the value
    domain and run per-range calls to bound it).

    Output, one row: files/rows/overlap_pairs/max_depth/avg_depth_ppm
    before (measured from the layout on disk), the planned after
    (sorted_after_stats closed form), and the measured after (the
    clustering_advisor sweep over the written bounds + re-aggregated
    membership digests).
    """
    from iceberg_diag_spark.operators.maintenance import (
        clustering_advisor,
        sorted_after_stats,
    )
    from iceberg_diag_spark.operators.sampling import membership_checksums
    from iceberg_diag_spark.operators.shuffling import grouped_prefix_sum
    from iceberg_diag_spark.sources.sinks import delete_paths
    from pyspark.sql.window import Window

    if rows_per_file <= 0:
        raise ValueError("rows_per_file must be positive")
    m = rows_per_file
    pre = spark.read.schema(read_schema).parquet(path)
    x1, x2 = membership_checksums(F.col(key_col))

    def _per_file(rel: DataFrame) -> DataFrame:
        return (
            rel.withColumn("_phys_file", F.input_file_name())
            .groupBy(file_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.min(value_col).cast("long").alias("lo"),
                F.max(value_col).cast("long").alias("hi"),
                F.countDistinct("_phys_file").cast("long").alias("n_phys"),
                x1.alias("x1"),
                x2.alias("x2"),
            )
        )

    def _sweep(per_file: DataFrame) -> DataFrame:
        return clustering_advisor(
            per_file.select(
                F.lit("v").alias("col_name"), file_col, "lo", "hi"
            )
        ).select(
            F.lit(1).alias("_k"),
            F.col("n_files"),
            "overlap_pairs",
            "max_depth",
            "avg_depth_ppm",
        )

    # ONE metadata pre-pass over the input (bounds + digests), eager:
    # the rewrite below replaces every file it was computed from.
    bef_files = _per_file(pre).localCheckpoint(eager=True)
    bef = _sweep(bef_files).join(
        bef_files.agg(
            F.sum("n_rows").cast("long").alias("rows_before"),
            F.sum("n_phys").cast("long").alias("phys_before"),
        ).select(F.lit(1).alias("_k"), "rows_before", "phys_before"),
        "_k",
    )

    # Per-value counts: ONE data scan; drives both the prediction and
    # the ranking, so it is computed once and checkpointed.
    vals = (
        pre.groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
        .select(F.lit("v").alias("col_name"), "v", "k")
        .localCheckpoint(eager=True)
    )
    planned = sorted_after_stats(vals, m).select(
        F.lit(1).alias("_k"),
        F.col("n_files").alias("files_planned"),
        F.col("overlap_pairs_after").alias("overlap_pairs_planned"),
        F.col("max_depth_after").alias("max_depth_planned"),
        F.col("avg_depth_ppm_after").alias("avg_depth_ppm_planned"),
    )

    # Rewrite: global rank = value's exclusive prefix + intra-value
    # row_number; target file = (rank-1) DIV m (contiguous 0..F-1,
    # every file non-empty).
    base = grouped_prefix_sum(vals, "col_name", "v", "k", out_col="__pre")
    data_cols = [
        f.name for f in pre.schema.fields if f.name != file_col
    ]
    iw = Window.partitionBy(value_col).orderBy(key_col)
    ranked = (
        pre.select(*data_cols)
        .join(
            base.select(F.col("v").alias(value_col), "__pre"),
            value_col,
        )
        .withColumn(
            "__rank", F.col("__pre") + F.row_number().over(iw)
        )
        .select(
            *data_cols,
            ((F.col("__rank") - 1) / m).cast("long").alias(file_col),
        )
        .localCheckpoint(eager=True)  # the write replaces its input
    )
    n_rows_total = int(
        bef_files.agg(F.sum("n_rows")).collect()[0][0] or 0
    )
    n_files_new = -(-n_rows_total // m)  # ceil; ranks are contiguous
    (
        ranked.repartition(max(1, int(n_files_new)), file_col)
        .sortWithinPartitions(file_col, value_col, key_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(file_col)
        .parquet(path)
    )
    # Listing-driven stale-dir drops (same idiom as the bin-pack
    # sink): file ids are integers so interpolation would happen to
    # work, but the listing keeps both sinks on the one safe pattern
    # and the deletes batch through one FS handle + thread pool.
    delete_paths(
        spark,
        [
            uri
            for _pval, fid, uri in _leaf_dirs(spark, path, None, file_col)
            if fid >= n_files_new
        ],
    )

    # Measured after-state: entirely from the written files. The
    # per-file stats feed both the sweep and the total/digest
    # aggregate — checkpoint the file-count-scale relation so the
    # written layout is re-read once, not once per consumer.
    post_files = _per_file(
        spark.read.schema(read_schema).parquet(path)
    ).localCheckpoint(eager=False)
    aft = _sweep(post_files).join(
        post_files.agg(
            F.sum("n_rows").cast("long").alias("rows_after"),
            F.sum("n_phys").cast("long").alias("phys_after"),
            F.bit_xor("x1").alias("members_xor_after"),
            F.bit_xor("x2").alias("members_xor2_after"),
        ).select(
            F.lit(1).alias("_k"),
            "rows_after",
            "phys_after",
            "members_xor_after",
            "members_xor2_after",
        ),
        "_k",
    )

    return (
        bef.select(
            "_k",
            F.col("phys_before").alias("files_before"),
            "rows_before",
            F.col("overlap_pairs").alias("overlap_pairs_before"),
            F.col("max_depth").alias("max_depth_before"),
            F.col("avg_depth_ppm").alias("avg_depth_ppm_before"),
        )
        .join(planned, "_k")
        .join(
            aft.select(
                "_k",
                F.col("phys_after").alias("files_after"),
                "rows_after",
                F.col("overlap_pairs").alias("overlap_pairs_after"),
                F.col("max_depth").alias("max_depth_after"),
                F.col("avg_depth_ppm").alias("avg_depth_ppm_after"),
                "members_xor_after",
                "members_xor2_after",
            ),
            "_k",
        )
        .drop("_k")
    )
