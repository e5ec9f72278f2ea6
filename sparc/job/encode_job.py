"""The distributed encode job: scan → stripe partition → mapInArrow → sink.

Lifecycle (SURVEY.md §3.4):

    parquet/Iceberg scan (column-pruned by Catalyst)
      → stripe assignment (partition.py — explicit, deterministic, salted)
      → repartition(n, stripe_col)                 [the only shuffle]
      → mapInArrow(encode): per stripe — optional locality sort, stats,
        codec auto-selection, kernel encode → stream rows + footer row
      → append to the streams table (parquet dir; one atomic task commit
        per partition, so a stripe's streams+footer land together)

Resume: a stripe is complete iff its FOOTER row exists.  Re-running the
job anti-joins planned stripes against completed footers and encodes only
the remainder — per-partition lineage lives in the footer (input
fingerprint, row count, per-stream sizes + crc32 checksums).

Output schema (the "streams table"):
    stripe_id:long, column:string, kind:string, data:binary
FOOTER rows use column='', kind='FOOTER', data=UTF-8 JSON.
"""

from __future__ import annotations

import json
import zlib
from collections.abc import Iterator
from typing import Callable

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine import stripe as stripe_mod
from ..engine.stripe import ROW_INDEX_STRIDE
from . import partition as part_mod

STREAMS_SCHEMA = "stripe_id long, column string, kind string, data binary"

# "input" strategy: stripe_id = partition_id * SPACE + local chunk index
INPUT_SPLIT_SPACE = 1 << 16

_PA_OUT = pa.schema(
    [
        ("stripe_id", pa.int64()),
        ("column", pa.string()),
        ("kind", pa.string()),
        ("data", pa.large_binary()),
    ]
)


def _encode_partition_factory(
    codec: str,
    sort_within: list[str] | None,
    fingerprint: str,
    bloom_columns: list[str] | None = None,
    fsst: bool | None = None,
    input_split_mode: bool = False,
    done_stripes=frozenset(),  # frozenset[int] | Broadcast[frozenset[int]]
    rows_per_stripe: int = 0,
    row_index_stride: int | None = ROW_INDEX_STRIDE,
    sink_dir: str | None = None,
) -> Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]:
    """Build the mapInArrow function (no per-row Python anywhere inside).

    ``input_split_mode``: stripes are derived from the input partition id
    instead of a stripe column — the shuffle-free path (see run_encode).

    ``sink_dir`` switches on the "files" sink: each stripe's streams are
    written directly from the worker to ``<sink_dir>/stripes/<sid>.sparc``
    (temp file + atomic rename) and only the FOOTER row — now carrying
    the stripe file path and per-stream (offset, length) spans — flows
    back through Arrow into the manifest parquet.  This removes the
    encoded bytes from the Python→JVM transfer AND from the parquet
    encoder (both pure double-handling: the blobs are already
    block-codec compressed), and is the object-store PUT + manifest
    commit shape a 100 TB run uses.  Visibility is still footer-commit:
    a stripe file without a committed FOOTER row is invisible garbage,
    and a retried task atomically overwrites it with identical bytes.
    """

    def _emit(sub: pa.Table, sid: int) -> pa.RecordBatch:
        if sort_within:
            sub = sub.sort_by([(c, "ascending") for c in sort_within])
        streams, footer = stripe_mod.encode_stripe(
            sub, codec=codec, bloom_columns=bloom_columns, fsst=fsst,
            row_index_stride=row_index_stride,
        )
        return _to_batch(streams, footer, sid)

    def _to_batch(streams, footer, sid) -> pa.RecordBatch:
        crcs = {f"{c}/{k}": zlib.crc32(v) for (c, k), v in streams.items()}
        footer["crc32"] = crcs
        footer["stripe_id"] = sid
        footer["input_fingerprint"] = fingerprint
        footer["sorted_by"] = sort_within or []
        if sink_dir is not None:
            _write_stripe_file(streams, footer, sid)
            cols, kinds, blobs = [], [], []
        else:
            cols, kinds, blobs = [], [], []
            for (cname, kind), data in streams.items():
                cols.append(cname)
                kinds.append(kind)
                blobs.append(data)
        cols.append("")
        kinds.append("FOOTER")
        blobs.append(json.dumps(footer).encode())
        return pa.RecordBatch.from_arrays(
            [
                pa.array([sid] * len(cols), pa.int64()),
                pa.array(cols, pa.string()),
                pa.array(kinds, pa.string()),
                pa.array(blobs, pa.large_binary()),
            ],
            schema=_PA_OUT,
        )

    def _write_stripe_file(streams, footer, sid) -> None:
        import os

        rel = f"stripes/{sid}.sparc"
        path = os.path.join(sink_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        # span list (not a "col/kind" keyed dict): column names may
        # themselves contain the separator
        spans = []
        off = 0
        with open(tmp, "wb") as f:
            for (cname, kind), blob in streams.items():
                f.write(blob)
                spans.append([cname, kind, off, len(blob)])
                off += len(blob)
        os.replace(tmp, path)  # atomic: readers never see a partial file
        footer["stripe_file"] = rel
        footer["stream_spans"] = spans

    def encode_input_partition(
        batches: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        # Incremental: emit each stripe as soon as rows_per_stripe rows
        # have arrived — the worker's resident set stays one stripe, not
        # one whole input partition (large per-worker footprints are
        # first-touch-fault poison on fault-slow hosts, and at real scale
        # an input split can exceed executor memory anyway).
        from pyspark import TaskContext

        from .. import runtime

        runtime.init_worker()
        pid = TaskContext.get().partitionId()
        base = pid * INPUT_SPLIT_SPACE
        per = rows_per_stripe or (1 << 62)
        local = 0
        buf: list[pa.RecordBatch] = []
        buffered = 0

        # the done set arrives as a Spark Broadcast (one copy per executor,
        # not per task closure) when run_encode drives the job
        done = done_stripes.value if hasattr(done_stripes, "value") else done_stripes

        def flush(table: pa.Table, sid: int):
            if sid in done:
                return None
            return _emit(table, sid)

        # mid-stream cuts only at >= 2*per buffered rows: a partition of
        # ~per rows becomes ONE full stripe instead of a full stripe plus
        # a runt (runts compress worse and add per-stripe overhead); the
        # final stripe of a long partition lands in [per, 2*per).  Worker
        # residency stays bounded at <= 2 stripe targets.
        for b in batches:
            buf.append(b)
            buffered += b.num_rows
            while buffered >= 2 * per:
                if local >= INPUT_SPLIT_SPACE:
                    raise ValueError(
                        f"input partition {pid} exceeds {INPUT_SPLIT_SPACE} stripes; "
                        "raise target_rows_per_stripe or split the input"
                    )
                table = pa.Table.from_batches(buf)
                out = flush(table.slice(0, per), base + local)
                local += 1
                rest = table.slice(per)
                buf = rest.to_batches(max_chunksize=1 << 20) if rest.num_rows else []
                buffered = rest.num_rows
                if out is not None:
                    yield out
        if buffered:
            out = flush(pa.Table.from_batches(buf), base + local)
            if out is not None:
                yield out

    def encode_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .. import runtime

        runtime.init_worker()
        collected = list(batches)
        if not collected:
            return
        table = pa.Table.from_batches(collected)
        del collected
        stripe_ids = table[part_mod.STRIPE_COL]
        uniq = pa.compute.unique(stripe_ids).to_pylist()
        if len(uniq) == 1:
            # common case (partitions == stripes): no filter copy — the
            # partition IS the stripe (halves peak allocation, which the
            # host's fault pathology otherwise amplifies)
            yield _emit(table.drop_columns([part_mod.STRIPE_COL]), uniq[0])
            return
        for sid in uniq:
            sub = table.filter(pa.compute.equal(stripe_ids, sid))
            sub = sub.drop_columns([part_mod.STRIPE_COL])
            yield _emit(sub, sid)

    return encode_input_partition if input_split_mode else encode_partition


def completed_stripes_df(
    spark: SparkSession, out_dir: str, fingerprint: str | None = None
) -> DataFrame | None:
    """Stripe ids whose FOOTER row is committed, as a DataFrame (column
    name = the stripe column), or None when the output doesn't exist yet.

    The resume set stays plan-side: callers anti-join against it instead
    of collecting ids to the driver — at 10^7 stripes a collected
    ``isin`` literal is a multi-GB plan and a driver bottleneck, while
    the anti-join is just another (AQE-broadcastable) join."""
    try:
        df = spark.read.schema(STREAMS_SCHEMA).parquet(out_dir)
        df.schema  # force resolution so a missing dir fails here
    except Exception:
        return None
    footers = df.filter(F.col("kind") == "FOOTER")
    if fingerprint is not None:
        footers = footers.filter(
            F.get_json_object(F.col("data").cast("string"), "$.input_fingerprint")
            == fingerprint
        )
    return footers.select(
        F.col("stripe_id").alias(part_mod.STRIPE_COL)
    ).distinct()


def completed_stripes(
    spark: SparkSession, out_dir: str, fingerprint: str | None = None
) -> list[int]:
    """Stripe ids whose FOOTER row is committed (= resumable checkpoint).

    With ``fingerprint``, only stripes encoded from the same input
    fingerprint count as done — a changed input snapshot/reader conf must
    not silently reuse stripe ids for different content ("input" strategy
    ids are positional, so this check is what makes its resume safe).

    Driver-side list wrapper over :func:`completed_stripes_df` — for
    TESTS AND DIAGNOSTICS ONLY: no resume path collects ids to the driver
    anymore (at 10^7 stripes a frozenset of Python ints is ~1 GiB of
    driver heap)."""
    df = completed_stripes_df(spark, out_dir, fingerprint=fingerprint)
    if df is None:
        return []
    return [r[0] for r in df.collect()]


def completed_groups_df(
    spark: SparkSession, out_dir: str, fingerprint: str | None = None,
    group_col: str = "__sparc_done_group",
) -> DataFrame | None:
    """Distinct completed GROUPS (``stripe_id DIV INPUT_SPLIT_SPACE`` =
    the input partition id / scan-unit index) — the plan-side resume key
    for the positional-id strategies.

    Why group granularity is exact, not approximate: one input partition
    (or one batch of scan units) is processed by exactly one task, and
    that task's manifest rows — every stripe's streams/FOOTER it produced
    — commit atomically through the parquet task-commit protocol.  So a
    group with ANY committed footer has ALL its footers committed, and a
    broadcast anti-join on the group id skips exactly the work that is
    done.  The done set never touches the driver: it flows from the
    footer scan into a broadcast exchange built executor-side."""
    df = completed_stripes_df(spark, out_dir, fingerprint=fingerprint)
    if df is None:
        return None
    return df.select(
        F.expr(f"{part_mod.STRIPE_COL} DIV {INPUT_SPLIT_SPACE}").alias(group_col)
    ).distinct()


def run_encode(
    df: DataFrame,
    out_dir: str,
    *,
    key: str = "url",
    strategy: str = "hash",
    n_stripes: int | None = None,
    lang_col: str = "lang",
    target_rows_per_stripe: int = 100_000,
    codec: str = "zstd",
    sort_within: list[str] | None = None,
    resume: bool = True,
    fingerprint: str = "",
    n_partitions: int | None = None,
    bloom_columns: list[str] | None = None,
    fsst: bool | None = None,
    row_index_stride: int | None = ROW_INDEX_STRIDE,
    sink: str = "parquet",
) -> dict:
    """Run (or resume) the encode job.  Returns a summary dict.

    Strategies:
    - ``hash``: stripe = xxhash64(key) % n — content-addressed, needs one
      full shuffle (the default; what the north rule describes).
    - ``lang_salted``: lang-clustered with salting for skew (one shuffle).
    - ``input``: stripe = (input partition, local chunk) — shuffle-free;
      deterministic and resumable for a fixed input snapshot + reader
      conf.  The fast path when stripe/content affinity is not required:
      at cluster scale it removes the full-table shuffle entirely.

    Sinks:
    - ``parquet``: stream blobs ride inside the manifest parquet rows
      (self-contained single table; best for small outputs).
    - ``files``: workers write each stripe to its own raw file and only
      footers enter the manifest — no double-handling of encoded bytes
      (see _encode_partition_factory).  ``out_dir`` must be a filesystem
      all executors can reach (local dir here; an object-store mount /
      fsspec path at cluster scale).
    """
    if sink not in ("parquet", "files"):
        raise ValueError(f"unknown sink {sink!r}")
    sink_dir = out_dir if sink == "files" else None
    spark = df.sparkSession

    if strategy == "input":
        src = df
        skipped = 0
        if resume:
            done_df = completed_stripes_df(spark, out_dir, fingerprint=fingerprint)
            if done_df is not None:
                skipped = done_df.count()
                if skipped:
                    # Plan-side resume with NO driver-side id set: tag each
                    # row with its scan partition id (a narrow projection —
                    # evaluated in the same stage the encoder runs in, so
                    # it equals TaskContext.partitionId() there) and
                    # broadcast-anti-join against the completed groups.
                    # Partition-task commit atomicity makes group
                    # granularity exact (see completed_groups_df).
                    groups = completed_groups_df(
                        spark, out_dir, fingerprint=fingerprint
                    )
                    src = (
                        df.withColumn("__sparc_pid", F.spark_partition_id())
                        .join(
                            F.broadcast(groups),
                            F.col("__sparc_pid") == F.col("__sparc_done_group"),
                            "left_anti",
                        )
                        .drop("__sparc_pid")
                    )
        fn = _encode_partition_factory(
            codec, sort_within, fingerprint, bloom_columns, fsst,
            input_split_mode=True,
            rows_per_stripe=target_rows_per_stripe,
            row_index_stride=row_index_stride,
            sink_dir=sink_dir,
        )
        (
            src.mapInArrow(fn, schema=STREAMS_SCHEMA)
            .write.mode("append")
            .option("compression", "uncompressed")  # blobs are already zstd
            .parquet(out_dir)
        )
        return {"n_stripes": None, "skipped": skipped, "out_dir": out_dir}

    if strategy == "lang_salted":
        staged, total = part_mod.with_lang_salted_stripes(
            df, key=key, lang_col=lang_col, target_rows_per_stripe=target_rows_per_stripe
        )
        n_stripes = total
    else:
        if n_stripes is None:
            total_rows = df.count()
            n_stripes = part_mod.pick_stripe_count(total_rows, 0,
                                                   target_rows=target_rows_per_stripe)
        staged = part_mod.with_hash_stripes(df, key, n_stripes)

    skipped = 0
    if resume:
        done_df = completed_stripes_df(spark, out_dir)
        if done_df is not None:
            skipped = done_df.count()
            if skipped:
                # plan-side anti-join (matching the read path's semi-join
                # hygiene): no isin literal that scales with stripe count
                staged = staged.join(done_df, part_mod.STRIPE_COL, "left_anti")

    parts = n_partitions or n_stripes
    fn = _encode_partition_factory(
        codec, sort_within, fingerprint, bloom_columns, fsst,
        row_index_stride=row_index_stride, sink_dir=sink_dir,
    )
    out = (
        staged.repartition(parts, F.col(part_mod.STRIPE_COL))
        .mapInArrow(fn, schema=STREAMS_SCHEMA)
    )
    # stream blobs are already block-codec compressed; parquet-snappy on
    # top is pure CPU on incompressible data (both writing and reading)
    out.write.mode("append").option("compression", "uncompressed").parquet(out_dir)
    return {"n_stripes": n_stripes, "skipped": skipped, "out_dir": out_dir}


# unit index = fidx * UNIT_SPACE + unit_within_file: identical ids whether
# planning ran on the driver or distributed, and unique as long as
# fidx < 2^26 and units-per-file < 2^20 (sid = idx * 2^16 stays in int64)
UNIT_SPACE = 1 << 20


def _pack_units(fidx: int, num_row_groups: int, rg_rows, per: int):
    """Greedy row-group packing for one file -> [(idx, rg_lo, rg_hi)].
    ``rg_rows``: callable g -> rows in row group g (footer metadata)."""
    units = []
    lo, acc, u = 0, 0, 0
    for g in range(num_row_groups):
        acc += rg_rows(g)
        if acc >= per:
            units.append((fidx * UNIT_SPACE + u, lo, g + 1))
            u += 1
            lo, acc = g + 1, 0
    if lo < num_row_groups:
        units.append((fidx * UNIT_SPACE + u, lo, num_row_groups))
    return units


def _plan_units(
    spark: SparkSession, files: list[str], per: int,
    distributed: bool | None = None,
) -> DataFrame:
    """Scan-unit plan as a DataFrame [idx, path, rg_lo, rg_hi] with ~per
    rows per unit.  Footer-metadata only (row-group row counts; no data
    pages); on an Iceberg table the manifest carries the same counts with
    zero file opens.

    Planning is itself distributed above 64 files: footer reads fan out
    over a paths DataFrame via mapInArrow, so planning cost is
    parallel-flat in file count instead of a sequential driver loop
    (round-3 item: minutes of driver I/O at 10^6 files).  Unit ids are
    identical in both modes (fidx * UNIT_SPACE + unit-within-file), so
    resume works across planner modes."""
    return _plan_units_counted(spark, files, per, distributed)[0]


def _plan_units_rows(files: list[str], per: int) -> list[tuple]:
    """Driver-side unit rows [(idx, path, rg_lo, rg_hi), ...] — parquet
    footer metadata only (no data pages)."""
    import pyarrow.parquet as pq

    rows = []
    for fidx, path in enumerate(files):
        md = pq.ParquetFile(path).metadata
        rows.extend(
            (idx, path, lo, hi)
            for idx, lo, hi in _pack_units(
                fidx, md.num_row_groups,
                lambda g, _md=md: _md.row_group(g).num_rows, per,
            )
        )
    return rows


def _plan_units_counted(
    spark: SparkSession, files: list[str], per: int,
    distributed: bool | None = None,
) -> tuple[DataFrame, int | None]:
    """:func:`_plan_units` plus the unit count when the plan was built
    driver-side (None in distributed mode).  The count lets
    run_encode_units size its task fan-out WITHOUT a count() job — one
    whole Spark job of pure fixed cost per encode run, ~0.4 s at bench
    scale (18%% of a clean-window XL encode wall)."""
    if len(files) >= 1 << 26:
        raise ValueError(f"{len(files)} files exceeds the 2^26 unit id space")
    if distributed is None:
        distributed = len(files) > 64
    schema = "idx long, path string, rg_lo int, rg_hi int"
    if not distributed:
        rows = _plan_units_rows(files, per)
        return spark.createDataFrame(rows, schema), len(rows)

    files_df = spark.createDataFrame(list(enumerate(files)), "fidx long, path string")
    n_parts = max(1, min(len(files), spark.sparkContext.defaultParallelism * 2))

    def plan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        for b in batches:
            idxs, paths, los, his = [], [], [], []
            for fidx, path in zip(
                b.column("fidx").to_pylist(), b.column("path").to_pylist()
            ):
                md = pq.ParquetFile(path).metadata
                for idx, lo, hi in _pack_units(
                    fidx, md.num_row_groups,
                    lambda g, _md=md: _md.row_group(g).num_rows, per,
                ):
                    idxs.append(idx)
                    paths.append(path)
                    los.append(lo)
                    his.append(hi)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(idxs, pa.int64()),
                    pa.array(paths, pa.string()),
                    pa.array(los, pa.int32()),
                    pa.array(his, pa.int32()),
                ],
                names=["idx", "path", "rg_lo", "rg_hi"],
            )

    return files_df.repartition(n_parts, "fidx").mapInArrow(plan, schema), None


def plan_units_from_manifest(
    spark: SparkSession, manifest_df: DataFrame,
    target_rows_per_stripe: int,
) -> DataFrame:
    """Scan-unit plan [idx, path, rg_lo, rg_hi] from a MANIFEST-shaped
    table — ``path string, rg_rows array<long>`` (per-row-group row
    counts), optionally ``fidx long`` — with ZERO file opens anywhere:
    every number the planner needs is already a manifest column.  This is
    the Iceberg path end-to-end: the ``files`` metadata table (or
    ``planTasks()``) carries per-file split offsets and record counts, so
    a caller selects them into this shape and never lists a directory or
    reads a footer.  Cf. reference writer-side task planning, which also
    plans from table metadata (orc-core OrcInputFormat.generateSplitsInfo
    analog).

    Packing reuses :func:`_pack_units` per file, so unit ids are
    IDENTICAL to filesystem planning (:func:`_plan_units`) given the same
    file order — a job may plan from the manifest today and from footers
    tomorrow and resume still anti-joins correctly.  When ``fidx`` is
    absent it is assigned by path order (deterministic for a fixed
    snapshot).  The planning fan-out is metadata-sized: 10^6 manifest
    rows is ~tens of MB through one shuffle, independent of data volume.
    """
    from pyspark.sql import Window

    if "fidx" not in manifest_df.columns:
        manifest_df = manifest_df.withColumn(
            "fidx",
            F.row_number().over(Window.orderBy("path")).cast("long") - 1,
        )
    per = max(target_rows_per_stripe, 1)
    schema = "idx long, path string, rg_lo int, rg_hi int"
    n_parts = max(1, spark.sparkContext.defaultParallelism * 2)

    def plan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # pure metadata arithmetic — deliberately no pyarrow.parquet
        # import, no filesystem access: poisoning/nonexistent paths in
        # tests prove planning never touches a file
        for b in batches:
            idxs, paths, los, his = [], [], [], []
            for fidx, path, rg_rows in zip(
                b.column("fidx").to_pylist(),
                b.column("path").to_pylist(),
                b.column("rg_rows").to_pylist(),
            ):
                if fidx >= 1 << 26:
                    raise ValueError(
                        f"fidx {fidx} exceeds the 2^26 unit id space"
                    )
                for idx, lo, hi in _pack_units(
                    fidx, len(rg_rows), rg_rows.__getitem__, per
                ):
                    idxs.append(idx)
                    paths.append(path)
                    los.append(lo)
                    his.append(hi)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(idxs, pa.int64()),
                    pa.array(paths, pa.string()),
                    pa.array(los, pa.int32()),
                    pa.array(his, pa.int32()),
                ],
                names=["idx", "path", "rg_lo", "rg_hi"],
            )

    return (
        manifest_df.select("fidx", "path", "rg_rows")
        .repartition(n_parts, "fidx")
        .mapInArrow(plan, schema)
    )


def run_encode_paths(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    *,
    codec: str = "zstd",
    target_rows_per_stripe: int = 100_000,
    sort_within: list[str] | None = None,
    bloom_columns: list[str] | None = None,
    fsst: bool | None = None,
    row_index_stride: int | None = ROW_INDEX_STRIDE,
    fingerprint: str = "",
    resume: bool = True,
    n_partitions: int | None = None,
    columns: list[str] | None = None,
) -> dict:
    """Direct-scan encode: distribute parquet SCAN UNITS (file + row-group
    range) to workers; each worker reads its ranges with pyarrow
    (streamed row-group-at-a-time) and encodes stripes incrementally to
    the files sink.

    This removes the JVM from the data path entirely — no JVM parquet
    scan, no JVM->Python Arrow transfer: Spark only schedules.  At
    cluster scale this is the workers-read-from-object-store shape: an
    Iceberg scan task IS (file, row-group/offset range), so the planned
    task list slots straight in.  Splitting below file granularity
    matters because parallelism is unit-granular — a 15-file input on 32
    cores would otherwise cap at 15 tasks no matter how large the files.

    Units are built from parquet FOOTER METADATA ONLY (row-group row
    counts; no data pages touched): contiguous row groups of one file are
    greedily packed to ~``target_rows_per_stripe`` rows per unit.  On an
    Iceberg table the manifest carries these counts, so unit planning
    needs no file reads at all.  Stripe ids are (unit index, local
    chunk) — deterministic for a fixed input snapshot + stripe target, so
    resume via FOOTER checkpoints + the input fingerprint works exactly
    as in the ``input`` strategy.
    """
    import os

    if os.path.isfile(input_dir):
        files = [input_dir]
    else:
        files = sorted(
            os.path.join(input_dir, f)
            for f in os.listdir(input_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    if not files:
        raise ValueError(f"no parquet files under {input_dir}")
    per = max(target_rows_per_stripe, 1)
    if len(files) > 64:
        units_df, n_units = _plan_units_counted(spark, files, per)
        balanced = False
    else:
        # driver-side plan: interleave the unit rows round-robin across
        # the LocalRelation's contiguous slices (the files-sink decode
        # trick) so the encode is a SINGLE STAGE — no count() job, no
        # repartition exchange; units of one file spread across tasks
        rows = _plan_units_rows(files, per)
        n_parts = max(
            1, min(spark.sparkContext.defaultParallelism, len(rows))
        )
        rr = [u for j in range(n_parts) for u in rows[j::n_parts]]
        units_df = spark.createDataFrame(
            rr, "idx long, path string, rg_lo int, rg_hi int"
        )
        n_units = len(rows)
        balanced = True
    res = run_encode_units(
        spark, units_df, out_dir,
        codec=codec, target_rows_per_stripe=target_rows_per_stripe,
        sort_within=sort_within, bloom_columns=bloom_columns, fsst=fsst,
        row_index_stride=row_index_stride, fingerprint=fingerprint,
        resume=resume, n_partitions=n_partitions, columns=columns,
        n_units=n_units, balanced=balanced,
    )
    res["n_files"] = len(files)
    return res


def run_encode_units(
    spark: SparkSession,
    units_df: DataFrame,
    out_dir: str,
    *,
    codec: str = "zstd",
    target_rows_per_stripe: int = 100_000,
    sort_within: list[str] | None = None,
    bloom_columns: list[str] | None = None,
    fsst: bool | None = None,
    row_index_stride: int | None = ROW_INDEX_STRIDE,
    fingerprint: str = "",
    resume: bool = True,
    n_partitions: int | None = None,
    columns: list[str] | None = None,
    n_units: int | None = None,
    balanced: bool = False,
) -> dict:
    """Encode a pre-planned scan-unit DataFrame [idx long, path string,
    rg_lo int, rg_hi int] — the Iceberg slot-in point: an Iceberg scan
    produces exactly this shape ((file, row-group/offset range) tasks
    from manifest metadata), so a manifest-driven caller builds the
    units DataFrame from `table.newScan().planTasks()` (or the
    `snapshot.manifests` tables in Spark SQL) and hands it here without
    any filesystem listing or footer reads.  ``idx`` must be unique and
    deterministic for resume (see _plan_units for the fidx*UNIT_SPACE
    convention).  Everything else — streamed row-group reads in workers,
    incremental stripe cuts, files sink, group-level plan-side resume —
    is shared with run_encode_paths."""
    per = max(target_rows_per_stripe, 1)
    skipped = 0
    if resume:
        done_df = completed_stripes_df(spark, out_dir, fingerprint=fingerprint)
        if done_df is not None:
            skipped = done_df.count()
            if skipped:
                # unit-level plan-side resume: a unit's stripes commit
                # atomically with its task, so any committed footer of a
                # unit means the whole unit is done (completed_groups_df);
                # the done ids never reach the driver.
                groups = completed_groups_df(
                    spark, out_dir, fingerprint=fingerprint
                )
                units_df = units_df.join(
                    F.broadcast(groups),
                    units_df["idx"] == groups["__sparc_done_group"],
                    "left_anti",
                )
                n_units = None  # anti-join changed the todo count
    sink_dir = out_dir

    def encode_files(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import os as _os

        import pyarrow.parquet as pq

        from .. import runtime

        runtime.init_worker()

        def write_stripe(table: pa.Table, sid: int):
            if sort_within:
                table = table.sort_by([(c, "ascending") for c in sort_within])
            streams, footer = stripe_mod.encode_stripe(
                table, codec=codec, bloom_columns=bloom_columns, fsst=fsst,
                row_index_stride=row_index_stride,
            )
            crcs = {f"{c}/{k}": zlib.crc32(v) for (c, k), v in streams.items()}
            footer["crc32"] = crcs
            footer["stripe_id"] = sid
            footer["input_fingerprint"] = fingerprint
            footer["sorted_by"] = sort_within or []
            rel = f"stripes/{sid}.sparc"
            path = _os.path.join(sink_dir, rel)
            _os.makedirs(_os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp-{_os.getpid()}"
            spans = []
            off = 0
            with open(tmp, "wb") as f:
                for (cname, kind), blob in streams.items():
                    f.write(blob)
                    spans.append([cname, kind, off, len(blob)])
                    off += len(blob)
            _os.replace(tmp, path)
            footer["stripe_file"] = rel
            footer["stream_spans"] = spans
            return pa.RecordBatch.from_arrays(
                [
                    pa.array([sid], pa.int64()),
                    pa.array([""], pa.string()),
                    pa.array(["FOOTER"], pa.string()),
                    pa.array([json.dumps(footer).encode()], pa.large_binary()),
                ],
                schema=_PA_OUT,
            )

        for b in batches:
            for uidx, path, rg_lo, rg_hi in zip(
                b.column("idx").to_pylist(),
                b.column("path").to_pylist(),
                b.column("rg_lo").to_pylist(),
                b.column("rg_hi").to_pylist(),
            ):
                base = uidx * INPUT_SPLIT_SPACE
                local = 0
                buf: list[pa.RecordBatch] = []
                buffered = 0
                pf = pq.ParquetFile(path)
                # same 2*per cut rule as the input strategy: a unit packed
                # to ~per rows encodes as ONE full stripe, no runt
                for rb in pf.iter_batches(
                    batch_size=1 << 16,
                    row_groups=range(rg_lo, rg_hi),
                    columns=columns,
                    use_threads=False,  # 1 task = 1 core (see init_worker)
                ):
                    buf.append(rb)
                    buffered += rb.num_rows
                    while buffered >= 2 * per:
                        table = pa.Table.from_batches(buf)
                        out = write_stripe(table.slice(0, per), base + local)
                        local += 1
                        rest = table.slice(per)
                        buf = rest.to_batches(max_chunksize=1 << 20) if rest.num_rows else []
                        buffered = rest.num_rows
                        if out is not None:
                            yield out
                if buffered:
                    out = write_stripe(pa.Table.from_batches(buf), base + local)
                    if out is not None:
                        yield out

    # task fan-out sizing needs the todo-unit count; a caller-supplied
    # n_units (driver-side planning knows it for free) skips the count()
    # job — one whole Spark job of pure fixed cost per encode run,
    # measured ~0.4 s at bench scale.  The unit plan itself never lands
    # on the driver either way.
    n_units_todo = units_df.count() if n_units is None else n_units
    if balanced and not (
        n_partitions
        and n_partitions != spark.sparkContext.defaultParallelism
    ):
        # caller guarantees the unit rows are interleaved so that the
        # LocalRelation's contiguous slices balance (run_encode_paths
        # does this for driver-side plans, same trick as the files-sink
        # decode): single stage, NO exchange, no extra job — each task
        # carries ~n_units/cores uniform units, which balances BETTER
        # than 2x-cores round-robin when units don't divide evenly
        # (90 units / 64 tasks: stragglers carry 2x the mean; / 32
        # tasks: 3 vs mean 2.8)
        paths_df = units_df
    else:
        # 2x cores: enough task granularity to hide stragglers behind
        # the round-robin balance, without doubling the per-Python-task
        # fixed cost again (measured ~0.2 core-s/task JVM+protocol even
        # after the worker tuning; 4x cores was ~6 extra core-s per job
        # at 32 lanes)
        parts = n_partitions or max(
            1, min(n_units_todo, spark.sparkContext.defaultParallelism * 2)
        )
        # round-robin, NOT hash-on-idx: stripe ids derive from the unit
        # index (not the partition), so co-location is irrelevant — and
        # hashing ~N units into N partitions idles ~1/e of the cores
        # while stragglers carry 2-3 units (the same balls-in-bins fix
        # as the files-sink decode)
        paths_df = units_df.repartition(parts)
    (
        paths_df.mapInArrow(encode_files, schema=STREAMS_SCHEMA)
        .write.mode("append")
        .option("compression", "uncompressed")
        .parquet(out_dir)
    )
    return {
        "n_units": n_units_todo,
        "skipped": skipped,
        "out_dir": out_dir,
    }


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-stripe metrics/lineage as a DataFrame (parsed FOOTER rows)."""
    footers = (
        spark.read.schema(STREAMS_SCHEMA).parquet(out_dir)
        .filter(F.col("kind") == "FOOTER")
        .select("stripe_id", F.col("data").cast("string").alias("footer"))
    )
    parsed = footers.select(
        "stripe_id",
        F.from_json(
            "footer",
            "n_rows long, input_fingerprint string, sorted_by array<string>, "
            "columns array<struct<name:string, arrow_type:string, encoding:string, "
            "codec:string, n_rows:long, n_nulls:long>>",
        ).alias("f"),
        F.length("footer").alias("footer_bytes"),
    )
    return parsed.select(
        "stripe_id",
        F.col("f.n_rows").alias("n_rows"),
        F.col("f.input_fingerprint").alias("input_fingerprint"),
        F.col("f.sorted_by").alias("sorted_by"),
        F.col("f.columns").alias("columns"),
        "footer_bytes",
    )
