"""Snapshot table: manifest-pointer commits over plain parquet.

The directory-swap sink (`operators/upsert.py`) documents two
non-guarantees (SCALE.md §11): a reader between per-partition swaps
sees a TORN generation, and a crash mid-sequence needs writer-side
recovery.  This module closes both with the mechanism every lakehouse
format uses — data files are IMMUTABLE and a commit is one atomic
pointer update — re-expressed minimally over plain parquet:

    <table>/gen-00000001-<tok>/<p=v dirs...>   immutable generations
                                               (<tok> = per-attempt token:
                                               racing writers never share
                                               a directory)
    <table>/_manifests/00000001.json           snapshot: partition -> gen
                                               dir name; claimed by atomic
                                               create-exclusive
    <table>/_current                           pointer file: "1"

A merge writes ONLY the affected partitions into a NEW generation
directory, writes a manifest mapping every live partition to the
generation that holds its current rows, then commits by atomically
renaming the pointer file.  Readers resolve pointer → manifest → file
list, so:

- **Snapshot isolation**: a reader that resolved the pointer sees one
  consistent generation set forever — commits only ADD files; nothing
  a manifest references is deleted until `snapshot_vacuum`.
- **Atomic commit**: the crash window is a single file rename.
  Anything before it (a fully written generation + manifest) is
  simply unreferenced garbage for vacuum.  The only recovery rule is
  roll-forward of a half-renamed pointer (`_commit_recover`).
- **O(increment) writes**: untouched partitions keep their old
  generation's files — same pruned-write property as the swap sink.

Contract vs. the swap sink: readers are never torn, writer crashes
need no healing of live data, and CONCURRENT WRITERS are arbitrated:
each commit (a) writes its data under a generation directory whose
name carries a per-attempt token — two writers racing to gen N can
never clobber each other's files — and (b) claims the generation by
ATOMIC CREATE-EXCLUSIVE of its manifest (the optimistic-concurrency
primitive Delta Lake uses on HDFS), then (c) re-checks the pointer
still names the snapshot the merge was based on AND that the claim
file is still byte-identical to its own write.  Exactly one racer
commits a given generation; the others either REBASE — with
``max_conflict_rebases`` set and a write set disjoint from the
winner's, the loser overlays its partition mappings onto the winner's
manifest and commits the NEXT generation, reusing its already-written
data files (``_commit_rebasing``, Delta's conflict-resolution rule;
staged dirs are vacuum-protected by a lease-aged ``_inflight``
breadcrumb for the rebase window) — or, with budget remaining, RETRY
THE WHOLE MERGE against the winner's snapshot (``_retrying_merge``,
Delta's fallback for non-disjoint ConcurrentAppend: arbitration
re-reads the new current table, so last-writer-wins holds even on
overlapping keys) — or raise ``SnapshotWriteConflict`` (retry = re-run
the merge against the new snapshot); abandoned generation dirs are
garbage for ``snapshot_vacuum``.  Claims carry a LEASE
(``CLAIM_LEASE_MS``) kept alive by a HEARTBEAT: from claim creation
to pointer swap a daemon thread refreshes the claim file's mtime
every ``CLAIM_HEARTBEAT_MS`` (lease/5), and crash recovery prunes
only claims whose heartbeat is stale (mtime older than the lease).
A slow-but-alive writer therefore NEVER loses its claim, no matter
how long the commit tail runs — only a dead writer's claim (process
gone, heartbeat stopped) ages out, and a dead writer cannot race its
own replacement.  A writer frozen at the OS level (SIGSTOP, VM
pause) past the lease is the one case that can still be pruned while
technically alive; the ownership re-verify in ``_commit`` detects
the re-claim at the pointer swap and aborts with
``SnapshotWriteConflict``.  Aborted commits release their own claim
immediately.  On S3 the pointer PUT is
last-writer-wins full-object — still atomic for readers, unlike
multi-directory renames (exclusive-create needs a consistent store;
on raw S3 swap in a conditional PUT / DynamoDB log, as Delta does).

Reference: the engine's sink semantics mirror the reference's
delete-parent-then-upload index upsert (jobs/blob_storage_indexer.py:
1242-1334); the commit protocol itself follows the public
Delta/Iceberg design (manifest + pointer), scoped down to
single-writer parquet.
"""

from __future__ import annotations

import datetime as _dt
import functools
import json
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.operators.upsert import (
    _fs_delete,
    _no_partition_inference,
    _fs_exists,
    _fs_mkdirs,
    _fs_rename,
    _hfs,
    _partition_rel_path,
    merged_view,
)


class SnapshotWriteConflict(RuntimeError):
    """Another writer committed first: the snapshot this merge was
    based on is no longer current.  The table is intact (the winner's
    commit stands; this attempt's generation dir is unreferenced
    garbage for vacuum).  Retry by re-running the merge."""


def _write_text(spark, path: str, text: str) -> None:
    fs, p = _hfs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _write_text_exclusive(spark, path: str, text: str) -> None:
    """Atomic create-exclusive (``fs.create(p, overwrite=False)``):
    exactly one of N racing writers succeeds — the commit-arbitration
    primitive.  Raises ``SnapshotWriteConflict`` if the file exists."""
    fs, p = _hfs(spark, path)
    try:
        out = fs.create(p, False)
    except Exception as e:  # Py4JJavaError: FileAlreadyExistsException
        name = type(e).__name__
        msg = str(e)
        if "AlreadyExists" in msg or "already exists" in msg.lower():
            raise SnapshotWriteConflict(
                f"generation already claimed by a concurrent writer: {path}"
            ) from None
        raise RuntimeError(f"exclusive create failed ({name}): {msg}") from e
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark, path: str) -> str:
    jvm = spark.sparkContext._jvm
    fs, p = _hfs(spark, path)
    stm = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stm, "UTF-8")
    finally:
        stm.close()


def _commit_recover(spark, table_path: str) -> None:
    """Roll FORWARD a half-committed pointer: ``_current__tmp`` exists
    only between 'commit started' and 'commit done', and by then its
    manifest+generation are fully written — so finishing the rename is
    safe.  ``_write_text`` itself is NOT atomic though: a crash
    mid-write can leave a truncated/empty tmp whose roll-forward would
    brick every later ``_current_gen`` on ``int('')`` — so validate
    first (parses as an int AND that generation's manifest exists);
    anything else never reached the commit's atomic point and the tmp
    is deleted.  (Readers call this read-only-ly via fallback in
    ``_current_gen`` instead.)"""
    tmp = f"{table_path}/_current__tmp"
    cur = f"{table_path}/_current"
    if not _fs_exists(spark, tmp):
        return
    try:
        gen = int(_read_text(spark, tmp).strip())
        ok = _fs_exists(spark, _manifest_path(table_path, gen))
    except Exception:  # unreadable / non-int / missing-manifest probe
        ok = False
    if ok:
        # two writers can race this roll-forward (both starting merges
        # behind the same mid-swap commit) — or the live owner's own
        # rename lands first.  Whoever loses the rename must not
        # propagate: verify the pointer instead, and restore it if the
        # delete-then-rename interleaving left none.
        try:
            _fs_delete(spark, cur)
            _fs_rename(spark, tmp, cur)
        except Exception:
            got = None
            try:
                if _fs_exists(spark, cur):
                    got = int(_read_text(spark, cur).strip())
            except Exception:
                pass
            if got is None or got < gen:
                _write_text(spark, cur, str(gen))
    else:
        try:
            _fs_delete(spark, tmp)
        except Exception:
            pass


#: Claim lease: ``_claim_recover`` never prunes a claim manifest
#: whose mtime (refreshed by the owner's heartbeat) is younger than
#: this.  A live writer heartbeats every ``CLAIM_HEARTBEAT_MS`` and so
#: keeps its claim for the whole commit, however long it runs; the
#: cost is that a claim orphaned by a hard crash (SIGKILL between
#: claim and pointer) blocks new commits of that generation for up to
#: the lease (writers see ``SnapshotWriteConflict`` and retry later).
#: Aborts that raise (conflict, validation, injected failure)
#: self-clean their claim in ``_commit`` and never wait out the lease.
CLAIM_LEASE_MS = 10 * 60 * 1000

#: Heartbeat cadence for in-flight claims — well inside the lease so
#: a single missed beat (GC pause, slow NN RPC) never looks stale.
CLAIM_HEARTBEAT_MS = CLAIM_LEASE_MS // 5


def _start_claim_heartbeat(spark, claimed: str):
    """Refresh ``claimed``'s mtime every ``CLAIM_HEARTBEAT_MS`` from a
    daemon thread until the returned event is set (or the claim file
    disappears — pruned or self-released).  Keeps a slow-but-alive
    writer's claim perpetually younger than the lease, so
    ``_claim_recover`` only ever prunes claims whose OWNER IS GONE.
    (The commit clock is the ``committed_at_ms`` stamped inside the
    manifest body, not this mtime — heartbeat refreshes never move
    ``AS OF TIMESTAMP`` resolution.)"""
    import threading

    stop = threading.Event()

    def _beat() -> None:
        while not stop.wait(CLAIM_HEARTBEAT_MS / 1000.0):
            try:
                fs, p = _hfs(spark, claimed)
                if not fs.exists(p):
                    return
                fs.setTimes(p, _now_ms(spark), -1)
            except Exception:
                return

    threading.Thread(
        target=_beat, daemon=True, name="snapshot-claim-heartbeat"
    ).start()
    return stop


def _now_ms(spark) -> int:
    # the JVM clock, for comparability with HDFS/localFS mtimes that
    # the same JVM stamps
    return int(
        spark.sparkContext._jvm.java.lang.System.currentTimeMillis()
    )


def _claim_recover(
    spark, table_path: str, lease_ms: int | None = None
) -> None:
    """Writer-start recovery of CRASHED CLAIMS: a manifest with gen >
    the committed pointer is a commit that died between its
    create-exclusive claim and the pointer swap.  Left in place it
    would block the next writer's claim of that generation forever, so
    prune it (the committed snapshot is untouched — the pointer never
    moved) — but ONLY once its HEARTBEAT is stale (mtime older than
    ``CLAIM_LEASE_MS``): the owner refreshes the claim's mtime every
    ``CLAIM_HEARTBEAT_MS`` while mid-commit, so a claim with a live
    heartbeat belongs to a live writer no matter how long its commit
    has been running, and pruning is reserved for claims whose owner
    is gone.  A writer frozen at the OS level past the lease is the
    one way a live process can be pruned; ``_commit``'s
    claim-ownership re-verify catches the re-claim at the pointer
    swap.  Writers only; readers never mutate."""
    cur = _current_gen(spark, table_path)
    fs, mdir = _hfs(spark, f"{table_path}/_manifests")
    if not fs.exists(mdir):
        return
    lease = CLAIM_LEASE_MS if lease_ms is None else lease_ms
    now = _now_ms(spark)
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if not name.endswith(".json"):
            continue
        try:
            g = int(name[:-5])
        except ValueError:
            continue
        if (cur is None or g > cur) and (
            now - st.getModificationTime() > lease
        ):
            fs.delete(st.getPath(), False)


def _current_gen(spark, table_path: str) -> int | None:
    """Committed generation number, or None for an empty table.
    Readers NEVER mutate: a mid-commit pointer is resolved by reading
    the tmp file (the commit is complete but for the rename)."""
    cur = f"{table_path}/_current"
    tmp = f"{table_path}/_current__tmp"

    def _try_read(path):
        # exists() then read() is a TOCTOU under a concurrent swap —
        # treat a vanished-between-probes file as absent, not an error
        try:
            if _fs_exists(spark, path):
                return int(_read_text(spark, path).strip())
        except Exception:
            pass
        return None

    got = _try_read(cur)
    if got is not None:
        return got
    got = _try_read(tmp)
    if got is not None:
        return got
    # re-probe the pointer once: a concurrent commit's delete(cur) →
    # rename(tmp, cur) swap has an instant where the first probe
    # missed cur and the second missed tmp (already renamed) — on a
    # committed table one of the two exists at all times, so a second
    # look settles it.  Cost on a genuinely empty table: one exists().
    return _try_read(cur)


def _with_schema(
    extra: dict | None, df: DataFrame,
    partition_cols: list[str] | None = None,
    prev: dict | None = None,
) -> dict:
    """Attach the committed LOGICAL schema (and partition-column
    names) to a commit's manifest body.  The stored schema is the fix
    for partition-column type inference: read-back of a
    hive-partitioned generation otherwise re-infers partition types
    from directory NAMES, flipping a string column whose current
    values look numeric to BIGINT (crashing the next merge union with
    ANSI CAST_INVALID_INPUT, and silently changing the table's dtype
    between commits).  ``read_snapshot_table`` pins partition columns
    to these stored types; DESCRIBE DETAIL surfaces them (Delta's
    metadata card carries format + columns)."""
    from pyspark.sql.types import StructType

    # canonical column ORDER: the predecessor manifest's (Delta keeps
    # the logical order stable across commits — a partitioned
    # read-back otherwise appends partition columns last and the
    # stored order would drift after the first merge), then any new
    # columns in the frame's own order
    fields = {f.name: f for f in df.schema.fields}
    ordered = []
    if prev and prev.get("schema"):
        for fj in prev["schema"]["fields"]:
            if fj["name"] in fields:
                ordered.append(fields.pop(fj["name"]))
    ordered.extend(fields.values())
    out = dict(extra or {})
    out["schema"] = json.loads(StructType(ordered).json())
    if partition_cols:
        out["partition_cols"] = list(partition_cols)
    if prev and prev.get("renames") and "renames" not in out:
        out["renames"] = prev["renames"]
    return out


def _manifest_schema(manifest: dict):
    """(StructType, partition_cols) stored in a manifest, or
    (None, []) for manifests written before schema tracking."""
    from pyspark.sql.types import StructType

    raw = manifest.get("schema")
    if not raw:
        return None, []
    return StructType.fromJson(raw), list(manifest.get("partition_cols") or [])


def _read_parquet_pinned(
    spark, manifest: dict, base: str, paths: list[str] | None
) -> DataFrame:
    """Parquet scan with partition-column types PINNED to the
    manifest's stored schema instead of inferred from directory
    names.  ``paths`` None = whole-dir scan.  Manifests without a
    stored schema (legacy) read exactly as before."""
    schema, pcols = _manifest_schema(manifest)
    if schema is None:
        if paths is None:
            return spark.read.option("basePath", base).parquet(base)
        return spark.read.option("basePath", base).parquet(*paths)
    # thread-safe ref-counted toggle (see upsert._no_partition_inference
    # — a naive set/restore pair breaks under q219/q223's concurrent
    # writer threads sharing one SparkSession)
    with _no_partition_inference(spark):
        if paths is None:
            df = spark.read.option("basePath", base).parquet(base)
        else:
            df = spark.read.option("basePath", base).parquet(*paths)
    for c in pcols:
        if c in df.columns and c in schema.names:
            want = schema[c].dataType
            if df.schema[c].dataType != want:
                df = df.withColumn(c, F.col(c).cast(want))
    return df


def _gen_base(table_path: str, g: str) -> str:
    """Resolve a manifest generation reference to its directory.
    Normally a bare dir name under ``table_path``; a SHALLOW CLONE's
    manifest references the SOURCE table's generation dirs by absolute
    path (``snapshot_clone``) — immutability makes cross-table
    references safe until the source's vacuum, exactly Delta's
    shallow-clone contract."""
    return g if g.startswith("/") or "://" in g else f"{table_path}/{g}"


def _manifest_path(table_path: str, gen: int) -> str:
    return f"{table_path}/_manifests/{gen:08d}.json"


def _read_manifest(spark, table_path: str, gen: int) -> dict:
    return json.loads(_read_text(spark, _manifest_path(table_path, gen)))


def _gen_name(gen: int) -> str:
    """Generation directory name with a per-attempt token: two writers
    racing to the same generation number write to DIFFERENT
    directories, so the commit-time loser can never have clobbered the
    winner's data files.  The manifest stores the full name, so
    readers and vacuum never parse the token; vacuum parses only the
    8-digit gen prefix."""
    return f"gen-{gen:08d}-{uuid.uuid4().hex[:8]}"


def _gen_dir(table_path: str, name: str) -> str:
    return f"{table_path}/{name}"


def _list_partition_rels(spark, gen_dir: str, depth: int) -> list[str]:
    """Relative ``p=v[/q=w...]`` paths actually present under a
    generation directory (a merged partition can come out empty and is
    then absent).  Metadata listing only."""
    fs, root = _hfs(spark, gen_dir)
    rels: list[str] = []

    def walk(p, rel_parts, d):
        for st in fs.listStatus(p):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if "=" not in name:
                continue
            parts = rel_parts + [name]
            if d == 1:
                rels.append("/".join(parts))
            else:
                walk(st.getPath(), parts, d - 1)

    walk(root, [], depth)
    return rels


_DV_DIR = "_dvs"


def _dv_map(spark, table_path: str, manifest: dict) -> dict:
    """The accumulated deletion-vector map as of one manifest:
    {"<gen-dir>/<rel-file>": [row indices]} — empty when the snapshot
    carries no DVs.  DV files are immutable; the manifest references
    one by name, so readers of any snapshot see exactly its deletes
    (same isolation rule as data files)."""
    name = manifest.get("dv")
    if not name:
        return {}
    return json.loads(
        _read_text(spark, f"{table_path}/{_DV_DIR}/{name}")
    )["files"]


def _write_dv(spark, table_path: str, gen: int, files: dict) -> str:
    name = f"{gen:08d}-{uuid.uuid4().hex[:8]}.json"
    _fs_mkdirs(spark, f"{table_path}/{_DV_DIR}")
    _write_text(
        spark,
        f"{table_path}/{_DV_DIR}/{name}",
        json.dumps(
            {"files": {k: sorted(v) for k, v in files.items()}},
            sort_keys=True,
        ),
    )
    return name


def _carry_dv_ref(
    spark, table_path: str, old_manifest: dict, new_partitions: dict,
    gen: int,
) -> dict | None:
    """A rewriting commit must CARRY the deletion vectors of files it
    did not rewrite: entries whose (generation, partition) is still
    live in the new manifest survive; entries for rewritten partitions
    die (their deletes were materialized by the read the rewrite was
    based on).  Reuses the old immutable DV file when nothing was
    dropped.  Returns the manifest ``extra`` dict or None."""
    dv = _dv_map(spark, table_path, old_manifest)
    if not dv:
        return None
    live = {(g, r) for r, g in new_partitions.items()}
    # DV keys are "<genref>/<relpath>"; genref may itself contain
    # slashes (a shallow clone's ABSOLUTE source-generation ref), so
    # parse by longest-prefix match against the known generation refs
    # rather than split('/', 1).
    gens = sorted(
        {g for g in old_manifest["partitions"].values()}
        | {g for _, g in ((r, g) for r, g in new_partitions.items())},
        key=len, reverse=True,
    )
    kept = {}
    for k, v in dv.items():
        gname = next((g for g in gens if k.startswith(g + "/")), None)
        if gname is None:
            continue
        rest = k[len(gname) + 1:]
        rel = "/".join(rest.split("/")[:-1])
        if (gname, rel) in live:
            kept[k] = v
    if not kept:
        return None
    if kept == dv:
        return {"dv": old_manifest["dv"]}
    return {"dv": _write_dv(spark, table_path, gen, kept)}


def _apply_dv(
    spark, df: DataFrame, gname: str, dv_map: dict,
    base: str | None = None,
) -> DataFrame:
    """Merge-on-read: anti-join the per-file deleted row positions
    (broadcast — DV size is bounded by the write-path contract) against
    the scan's (file, row_index) metadata.  No DV entries for this
    generation → the scan is returned untouched (zero overhead).

    ``gname`` is the manifest's generation REF — a bare dir name, or a
    shallow clone's absolute source path (may contain slashes), so DV
    keys are matched by ``startswith(gname + '/')`` and the scan's
    file paths are relativized against the RESOLVED directory
    (``base``), never by splitting on the first slash."""
    pairs = [
        (k[len(gname) + 1:], int(pos))
        for k, v in dv_map.items()
        if k.startswith(gname + "/")
        for pos in v
    ]
    if not pairs:
        return df
    delim = (base.rstrip("/") if base else f"/{gname}") + "/"
    doomed = spark.createDataFrame(pairs, "__file string, __pos long")
    tagged = df.withColumn(
        "__file",
        F.substring_index(F.col("_metadata.file_path"), delim, -1),
    ).withColumn("__pos", F.col("_metadata.row_index"))
    return tagged.join(
        F.broadcast(doomed), on=["__file", "__pos"], how="left_anti"
    ).drop("__file", "__pos")


def snapshot_gen_at_timestamp(
    spark: SparkSession, table_path: str, ts_ms: int
) -> int:
    """TIME TRAVEL BY TIMESTAMP (Delta's `AS OF TIMESTAMP` half of the
    surface; ``at_gen`` is the `AS OF VERSION` half): the newest
    committed generation whose commit clock is at or before ``ts_ms``
    (epoch millis).  The clock is the ``committed_at_ms`` stamped
    INSIDE the manifest at `_commit` time (durable: survives
    copy/rsync/DR restore, monotonic by construction — clamped to
    predecessor + 1 ms); manifests written before the stamp existed
    fall back to file mtime.  One manifest read per retained
    generation — O(retained), bounded by vacuum.  Raises if every
    retained manifest is newer (the asked-for moment predates
    retention or the table)."""
    cur = _current_gen(spark, table_path)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    fs, mdir = _hfs(spark, f"{table_path}/_manifests")
    best = None
    if fs.exists(mdir):
        for st in fs.listStatus(mdir):
            name = st.getPath().getName()
            if not name.endswith(".json"):
                continue
            try:
                g = int(name[:-5])
            except ValueError:
                continue
            if g > cur:
                continue
            ts = None
            try:
                ts = _read_manifest(spark, table_path, g).get(
                    "committed_at_ms"
                )
            except Exception:
                ts = None
            if ts is None:  # pre-r12 manifest: mtime fallback
                ts = st.getModificationTime()
            if int(ts) <= int(ts_ms) and (best is None or g > best):
                best = g
    if best is None:
        raise FileNotFoundError(
            f"no snapshot of {table_path} existed at ts={ts_ms} "
            "(before the table, or vacuumed past retention)"
        )
    return best


def _apply_renames(manifest: dict, g: str, df: DataFrame) -> DataFrame:
    """COLUMN-MAPPING renames (Delta column mapping, name mode): a
    rename commit never rewrites data — it records the generation
    directories live at rename time (``dirs``), whose files carry the
    OLD physical name; those read back renamed, while directories
    written after the rename already carry the new name and match no
    entry.  Applying entries in commit order composes chained renames
    (a -> b -> c).  Dir-name matching (names embed a random per-attempt
    token, so they are globally unique) rather than a bare
    from-in-columns check keeps a LATER schema-evolution column that
    legitimately reuses the old name from being renamed by accident."""
    renames = manifest.get("renames") or []
    if not renames:
        return df
    base_name = g.rstrip("/").rsplit("/", 1)[-1]
    for r in renames:
        if base_name in r["dirs"] and r["from"] in df.columns:
            if r["to"] is None:          # metadata-only DROP COLUMN
                df = df.drop(r["from"])
            else:
                df = df.withColumnRenamed(r["from"], r["to"])
    return df


def read_snapshot_table(
    spark: SparkSession, table_path: str, at_gen: int | None = None,
    at_ts_ms: int | None = None,
) -> DataFrame:
    """The committed snapshot as a DataFrame.  One parquet scan per
    referenced generation (vacuum/optimize folds old generations, so
    the union stays shallow); partition columns come back via
    ``basePath``, and Catalyst partition-prunes within each scan.
    Generations may differ in schema (an increment that added a
    column): the union aligns by name with missing columns as NULL —
    the same evolution contract as the swap sink's merge.

    ``at_gen`` is TIME TRAVEL (`AS OF VERSION`); ``at_ts_ms`` is
    `AS OF TIMESTAMP` (resolved to a generation via manifest mtimes,
    ``snapshot_gen_at_timestamp``) — valid for any manifest vacuum
    has not yet
    removed (vacuum is the retention boundary, as in every lakehouse
    format).

    AS-OF ACROSS A RENAME/DROP (column-mapping contract): a
    time-travel read renders the schema AS OF THAT VERSION — a read
    at a pre-rename generation shows the OLD column name and a
    pre-drop read still carries the dropped column — because each
    manifest stores its own logical schema + rename history and a
    snapshot read is reproducible byte-for-byte.  This deliberately
    diverges from Delta, which renders time travel through the
    CURRENT logical schema.  RESTORE follows the same rule: it
    re-commits the TARGET's schema and rename history (see
    ``snapshot_restore``), and tests/test_column_mapping_matrix.py
    pins the full {rename, drop} x {time-travel, clone, restore,
    optimize} grid."""
    if at_gen is not None and at_ts_ms is not None:
        raise ValueError("pass at_gen or at_ts_ms, not both")
    if at_ts_ms is not None:
        at_gen = snapshot_gen_at_timestamp(spark, table_path, at_ts_ms)
    gen = at_gen if at_gen is not None else _current_gen(spark, table_path)
    if gen is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    if not _fs_exists(spark, _manifest_path(table_path, gen)):
        raise FileNotFoundError(
            f"no manifest for generation {gen} at {table_path} "
            "(never committed, or removed by snapshot_vacuum)"
        )
    manifest = _read_manifest(spark, table_path, gen)
    parts: dict[str, str] = manifest["partitions"]
    dv = _dv_map(spark, table_path, manifest)
    by_gen: dict[str, list[str]] = {}
    for rel, g in parts.items():
        by_gen.setdefault(g, []).append(rel)
    dfs = []
    for g, rels in sorted(by_gen.items()):
        base = _gen_base(table_path, g)
        if rels == [""]:  # unpartitioned
            raw = spark.read.parquet(base)
        else:
            # partition-column types come PINNED from the manifest's
            # stored schema, never re-inferred from directory names
            raw = _read_parquet_pinned(
                spark, manifest, base,
                [f"{base}/{r}" for r in sorted(rels)],
            )
        dfs.append(_apply_renames(manifest, g, _apply_dv(spark, raw, g, dv, base=base)))
    return functools.reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def _commit(
    spark, table_path: str, gen: int, partitions: dict,
    expected_cur: int | None,
    extra: dict | None = None,
    op: str = "merge",
) -> None:
    """Fenced commit.  Leg 1: claim generation ``gen`` by atomic
    create-exclusive of its manifest — of N writers that based their
    merge on the same snapshot (and so computed the same ``gen``),
    exactly one create succeeds; the rest raise
    ``SnapshotWriteConflict`` before touching the pointer.  Leg 2:
    re-read the pointer and verify it still names ``expected_cur`` —
    catches the pathological stale-writer case where vacuum removed
    the manifest a faster chain of commits had claimed (the
    create-exclusive would wrongly succeed).  Only then the atomic
    pointer swap."""
    body = {"gen": gen, "partitions": partitions, "op": op}
    if extra:
        body.update(extra)
    # schema CARRY: metadata-only commits (delete-by-DV, optimize,
    # compact, constraint-era ops) inherit the predecessor manifest's
    # stored schema, so once a data commit records it, every later
    # snapshot has one without threading it through each call site.
    # Data commits that change the schema pass it via ``extra``
    # (``_with_schema``).  Rebase note: a rebased commit re-enters
    # here with the RIVAL's gen as expected_cur, so the carry picks up
    # the rival's schema when ours didn't state one — and partition-
    # column types (the part read-back depends on) never change
    # across disjoint-partition rebases.
    prev = None
    if expected_cur is not None:
        try:
            prev = _read_manifest(spark, table_path, expected_cur)
        except Exception:
            prev = None
    if expected_cur is not None and (
        "schema" not in body
        or "renames" not in body
        or "txn" not in body
    ):
        if prev:
            if "schema" not in body and prev.get("schema"):
                body["schema"] = prev["schema"]
                if prev.get("partition_cols"):
                    body["partition_cols"] = prev["partition_cols"]
            # column-mapping rename history carries like the schema —
            # a commit that doesn't state it inherits it
            if "renames" not in body and prev.get("renames"):
                body["renames"] = prev["renames"]
            # idempotent-writer ledger (Delta txnAppId/txnVersion):
            # carries forward so any commit chain preserves every
            # app's high-water version — minus entries past the
            # retention horizon (snapshot_set_ledger_retention), so
            # non-txn commits (optimize, restore, rename) trim the
            # map too and a long compaction-only tail still converges
            if "txn" not in body and prev.get("txn"):
                led = dict(prev["txn"])
                ages = dict(prev.get("txn_gen") or {})
                retain = _ledger_retention(spark, table_path)
                if retain is not None:
                    for a in list(led):
                        base = ages.get(a)
                        if base is None:
                            ages[a] = gen
                        elif gen - int(base) > retain:
                            del led[a]
                            del ages[a]
                if led:
                    body["txn"] = led
                    body["txn_gen"] = {
                        a: g for a, g in ages.items() if a in led
                    }
    # DURABLE COMMIT CLOCK (r11 verdict #1): the `AS OF TIMESTAMP`
    # clock is stamped INSIDE the manifest JSON, not left to file
    # mtimes — mtimes don't survive a table copy/rsync/DR restore and
    # can go non-monotonic under clock skew.  Delta stores the commit
    # timestamp in the log and adjusts non-monotonic clocks; same rule
    # here: clamp to predecessor + 1 ms (predecessor read from ITS
    # stamp, mtime fallback only for pre-r12 manifests so the chain
    # stays monotonic across the upgrade boundary).  Always
    # overwritten, never carried: RESTORE/CLONE re-commits get the
    # restore's own time, not the target's.
    _now = _now_ms(spark)
    _prev_ts = None
    if prev is not None:
        _prev_ts = prev.get("committed_at_ms")
        if _prev_ts is None:
            try:
                _pfs, _pmp = _hfs(
                    spark, _manifest_path(table_path, expected_cur)
                )
                _prev_ts = int(_pfs.getFileStatus(_pmp).getModificationTime())
            except Exception:
                _prev_ts = None
    body["committed_at_ms"] = (
        _now if _prev_ts is None else max(_now, int(_prev_ts) + 1)
    )
    body_json = json.dumps(body, sort_keys=True)
    claimed = _manifest_path(table_path, gen)
    _write_text_exclusive(spark, claimed, body_json)
    heartbeat_stop = _start_claim_heartbeat(spark, claimed)
    tmp = f"{table_path}/_current__tmp"
    cur = f"{table_path}/_current"
    try:
        try:
            actual = _current_gen(spark, table_path)
            if actual != expected_cur:
                raise SnapshotWriteConflict(
                    f"snapshot moved during merge: based on "
                    f"{expected_cur}, pointer now at {actual} "
                    f"({table_path})"
                )
            # claim-ownership re-verify: the heartbeat keeps a live
            # writer's claim from ever aging out, but a writer frozen
            # at the OS level past CLAIM_LEASE_MS (heartbeat thread
            # frozen with it) can still be pruned and the generation
            # re-claimed by a rival — swapping the pointer now would
            # commit the RIVAL's manifest under this writer's name.
            # The generation dir names inside ``partitions`` carry a
            # per-attempt token, so byte-comparing the manifest
            # proves ownership.
            if _read_text(spark, claimed) != body_json:
                raise SnapshotWriteConflict(
                    f"claim for generation {gen} was pruned after a "
                    f">{CLAIM_LEASE_MS} ms heartbeat gap and "
                    f"re-claimed by another writer ({table_path}); "
                    "retry the merge"
                )
            # the PREDECESSOR's commit may still be mid-swap: its tmp
            # is written (so _current_gen reported expected_cur) but
            # its rename is pending — writing our tmp now would
            # overwrite its pointer and one of the two renames would
            # find tmp gone.  Wait for the swap to clear; if the
            # writer died mid-swap, roll its rename forward (the same
            # roll-forward _commit_recover performs).
            import time as _time

            for _ in range(200):
                if not _fs_exists(spark, tmp):
                    break
                _time.sleep(0.05)
            else:
                # forced roll-forward of a dead predecessor's swap:
                # validate tmp EXACTLY as _commit_recover does before
                # renaming it over the pointer (r8 advisor: a writer
                # SIGKILLed mid-_write_text leaves a truncated/garbage
                # tmp; renaming that over a valid _current bricks the
                # table).  Invalid tmp never reached its commit's
                # atomic point — delete it; and never touch cur until
                # tmp is known-good.
                try:
                    pg = int(_read_text(spark, tmp).strip())
                    tmp_ok = _fs_exists(spark, _manifest_path(table_path, pg))
                except Exception:
                    tmp_ok = False
                try:
                    if tmp_ok:
                        if _fs_exists(spark, cur):
                            _fs_delete(spark, cur)
                        _fs_rename(spark, tmp, cur)
                    else:
                        _fs_delete(spark, tmp)
                except Exception:
                    pass
            if _current_gen(spark, table_path) != expected_cur:
                raise SnapshotWriteConflict(
                    f"snapshot moved during merge: based on "
                    f"{expected_cur} ({table_path})"
                )
            _write_text(spark, tmp, str(gen))
        except BaseException:
            # Abort BEFORE the commit's atomic point (a fully written
            # tmp pointer): release the claim so the table is
            # immediately writable instead of blocked for the lease —
            # but only if the claim is still OURS (never delete a
            # rival's manifest).  Best-effort: a failure here leaves
            # an orphan for the lease path.
            try:
                if _read_text(spark, claimed) == body_json:
                    _fs_delete(spark, claimed)
            except Exception:
                pass
            try:
                # our tmp only — full ("57") or truncated ("5") writes
                # of str(gen) are prefixes; a rival's valid pointer
                # mid-swap names a different gen and is left alone
                if _fs_exists(spark, tmp):
                    t = _read_text(spark, tmp).strip()
                    if str(gen).startswith(t):
                        _fs_delete(spark, tmp)
            except Exception:
                pass
            raise
        _fs_delete(spark, cur)
        try:
            _fs_rename(spark, tmp, cur)
        except Exception:
            # a concurrent writer's _commit_recover may have rolled
            # THIS swap forward (consuming tmp) between our delete and
            # rename — the commit is then already visible.  Verify the
            # pointer; if the roll-forward itself raced our delete and
            # left NO pointer, rewrite it (we know our generation, and
            # a successor cannot have committed without first
            # observing ours).
            got = None
            try:
                if _fs_exists(spark, cur):
                    got = int(_read_text(spark, cur).strip())
            except Exception:
                pass
            if got is None or got < gen:
                _write_text(spark, cur, str(gen))
    finally:
        heartbeat_stop.set()


def _commit_rebasing(
    spark, table_path: str, gen: int, partitions: dict,
    expected_cur: int | None,
    extra: dict | None = None,
    op: str = "merge",
    max_rebases: int = 0,
    refuse_rebase: str | None = None,
) -> int:
    """``_commit`` with Delta-style CONCURRENCY CONTROL: when the
    pointer moved while this writer was computing (another job
    committed first), do not give up — if the two write sets touch
    DISJOINT partitions, REBASE this commit onto the new snapshot
    (overlay our changed/removed partition mappings onto the rival's
    manifest) and retry at the next generation.  This is what lets N
    ingest jobs land concurrently on one 100 TB table when each owns
    its partition range, instead of serializing through retry-the-
    whole-merge.

    Correctness preconditions (refused otherwise, raising the
    original ``SnapshotWriteConflict``):
    - overlapping write sets never rebase (the rival may have changed
      rows this merge's arbitration read);
    - deletion vectors on either side never rebase (our staged DV map
      was computed against the base manifest; the rival's DV ref
      would be silently dropped by our manifest);
    - writes that minted GENERATED ALWAYS AS IDENTITY values never
      rebase (``refuse_rebase``): the ids derive from the BASE
      snapshot's high-water mark, so two disjoint-partition rivals
      would commit colliding ids — they must re-run the merge against
      the winner instead (``_retrying_merge``).
    Callers must also guarantee keys are PARTITION-LOCAL (the engine's
    partition columns derive from the merge key, e.g. bucket = key %
    N) — with cross-partition keys, two disjoint-partition merges can
    both insert the same key, the same write-serializable caveat
    Delta documents.

    Returns the committed generation.  A claim race on the same
    generation (rival claimed but has not committed) waits briefly
    for the pointer to move and retries; ``max_rebases`` bounds both
    loops."""
    import time

    base_parts: dict = (
        {}
        if expected_cur is None
        else dict(
            _read_manifest(spark, table_path, expected_cur)["partitions"]
        )
    )
    # dirs THIS writer staged (vs inherited base refs) — what a rebase
    # must keep alive across a concurrent vacuum (see
    # _register_inflight) and re-verify before every rebased attempt
    ours_dirs = set(partitions.values()) - set(base_parts.values())
    crumb: str | None = None
    attempt_gen, attempt_parts, attempt_cur = gen, dict(partitions), expected_cur
    last: SnapshotWriteConflict | None = None
    try:
        for _ in range(max(0, int(max_rebases)) + 1):
            # claim-race patience (separate budget from the rebases): a
            # rival holding the SAME generation's claim either commits —
            # the pointer moves and we rebase — or aborts and releases the
            # claim, letting our retry land.  Mid-swap pointer reads
            # (None) are the same transient.
            actual = attempt_cur
            for _ in range(75):          # <= ~15 s per rebase attempt
                try:
                    _commit(
                        spark, table_path, attempt_gen, attempt_parts,
                        attempt_cur, extra=extra, op=op,
                    )
                    return attempt_gen
                except SnapshotWriteConflict as e:
                    last = e
                    actual = _current_gen(spark, table_path)
                    if actual is not None and actual != attempt_cur:
                        break            # rival committed: rebase below
                    time.sleep(0.2)
            else:
                raise last               # rival never resolved: give up
            if refuse_rebase:
                # this write set carries state derived from the BASE
                # snapshot that a silent rebase would not recompute
                # (e.g. identity values minted off the base's
                # high-water mark — two disjoint-partition rivals
                # would both derive the same mark and commit
                # colliding ids, r9 advisor medium).  Propagate the
                # conflict so _retrying_merge re-runs the whole merge
                # against the winner's snapshot.
                raise last
            if extra and extra.get("dv"):
                raise last
            actual_m = _read_manifest(spark, table_path, actual)
            if actual_m.get("dv"):
                raise last
            rival_parts = dict(actual_m["partitions"])
            ours = {
                r
                for r in set(attempt_parts) | set(base_parts)
                if attempt_parts.get(r) != base_parts.get(r)
            }
            theirs = {
                r
                for r in set(rival_parts) | set(base_parts)
                if rival_parts.get(r) != base_parts.get(r)
            }
            if ours & theirs:
                raise last
            # about to REBASE: our staged dirs are now named with a
            # generation <= the rival's committed cur, i.e. inside
            # vacuum's deletable range (r8 advisor).  Register the
            # lease-aged _inflight breadcrumb (once), then verify the
            # dirs still exist — a vacuum that won the race already
            # claimed them, and committing would reference vanished
            # files; surface the conflict instead.
            if crumb is None:
                try:
                    crumb = _register_inflight(spark, table_path, ours_dirs)
                except Exception:
                    crumb = None     # best-effort; the verify still runs
            for d in ours_dirs:
                if d.startswith("gen-") and not _fs_exists(
                    spark, _gen_dir(table_path, d)
                ):
                    raise SnapshotWriteConflict(
                        f"staged generation dir {d} was removed by a "
                        f"concurrent snapshot_vacuum during rebase "
                        f"({table_path}); retry the merge"
                    )
            rebased = dict(rival_parts)
            for r in ours:
                if r in attempt_parts:
                    rebased[r] = attempt_parts[r]
                else:
                    rebased.pop(r, None)
            base_parts = rival_parts
            attempt_parts = rebased
            attempt_cur = actual
            attempt_gen = actual + 1
        assert last is not None
        raise last
    finally:
        if crumb is not None:
            try:
                _fs_delete(spark, crumb)
            except Exception:
                pass


class SnapshotSchemaMismatch(ValueError):
    """Strict-mode merge found incoming columns the table does not
    have, or a type conflict on a shared column.  Nothing was
    written."""


def _enforce_schema(existing: DataFrame, incoming: DataFrame) -> None:
    have = {f.name: f.dataType.simpleString() for f in existing.schema.fields}
    inc = {f.name: f.dataType.simpleString() for f in incoming.schema.fields}
    extras = sorted(set(inc) - set(have))
    if extras:
        raise SnapshotSchemaMismatch(
            f"incoming columns not in the table schema: {extras} "
            "(pass schema_evolution='merge' to evolve)"
        )
    # partition-column types are PINNED on read-back from the
    # manifest's stored schema (r9: no more directory-name inference),
    # so strict mode compares them like any other column
    clashes = {
        c: (have[c], t)
        for c, t in inc.items()
        if have[c] != t
    }
    if clashes:
        raise SnapshotSchemaMismatch(
            f"column type conflicts (table vs incoming): {clashes}"
        )



def _txn_gate(spark, table_path: str, txn_app_id, txn_version, cur):
    """Idempotent-writes ledger gate shared by every write path
    (Delta txnAppId/txnVersion).  ``cur`` is the PINNED base
    generation the caller read ONCE at the top of its write attempt
    and will pass as ``expected_cur`` to the commit — the ledger is
    derived from that same generation's manifest, never re-read, so a
    rival committing anywhere after the pin surfaces as a
    ``SnapshotWriteConflict`` at commit time and the retry re-runs
    this gate against the winner (r10 advisor, medium: reading the
    ledger at one generation and expected_cur at a later one let a
    rival land in between — its ledger entries were silently dropped
    by our stamped map and its re-delivery double-applied).

    Returns ``(skip_gen, ledger, ledger_gens)``: ``skip_gen`` is the
    already-committed generation when this (app, version) was applied
    before — the caller returns it without writing; otherwise
    ``ledger`` is the updated {app: version} map and ``ledger_gens``
    the {app: last-updating-generation} age map to stamp into the
    commit's manifest (both ``None`` when no txn id was passed: the
    commit inherits the predecessor's ledger via the manifest carry).

    RETENTION (Delta's setTransactionRetentionDuration analog, keyed
    by generations instead of wall-clock — see
    ``snapshot_set_ledger_retention``): entries whose last-updating
    generation is more than the configured horizon behind the
    committing generation are EXPIRED here, bounding the manifest's
    ledger to the set of recently-active writers.  An expired app's
    re-delivery is NOT idempotent anymore (Delta's exact caveat) —
    the entry is gone, so the write applies again."""
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError(
            "txn_app_id and txn_version must be passed together"
        )
    if txn_app_id is None:
        return None, None, None
    ledger: dict = {}
    gens: dict = {}
    gen = (cur or 0) + 1
    if cur is not None:
        prev = _read_manifest(spark, table_path, cur)
        ledger = dict(prev.get("txn") or {})
        gens = dict(prev.get("txn_gen") or {})
        seen = ledger.get(txn_app_id)
        if seen is not None and int(txn_version) <= int(seen):
            return cur, None, None
    retain = _ledger_retention(spark, table_path)
    if retain is not None:
        for a in list(ledger):
            # pre-txn_gen manifests lack an age entry: grandfather the
            # app in at this commit so it starts aging from now
            age_base = gens.get(a)
            if age_base is None:
                gens[a] = gen
            elif gen - int(age_base) > retain:
                del ledger[a]
                del gens[a]
    ledger[txn_app_id] = int(txn_version)
    gens[txn_app_id] = gen
    gens = {a: g for a, g in gens.items() if a in ledger}
    return None, ledger, gens


_LEDGER_RETENTION_CONF = "_ledger_retention.json"


def snapshot_set_ledger_retention(
    spark: SparkSession, table_path: str, n_generations: int | None
) -> None:
    """Bound the idempotent-writes ledger (Delta's
    ``delta.setTransactionRetentionDuration``, keyed by GENERATIONS —
    the engine's version clock — instead of wall time): a txn app's
    {app: version} entry is dropped once ``n_generations`` commits
    have landed after its last write, so an orchestrator minting
    one-shot app ids (a backfill per day, a retried task per attempt)
    no longer grows every later manifest forever.  ``None`` clears
    the policy (the default: entries are kept forever, Delta's own
    default when the property is unset).

    CAVEAT (Delta's, verbatim in spirit): a re-delivery arriving
    AFTER its app's entry expired is no longer detected — the write
    applies again.  Set the horizon longer than the longest possible
    redelivery delay measured in commits."""
    if n_generations is not None and int(n_generations) < 1:
        raise ValueError("n_generations must be >= 1 or None")
    _fs_mkdirs(spark, table_path)
    p = f"{table_path}/{_LEDGER_RETENTION_CONF}"
    if n_generations is None:
        if _fs_exists(spark, p):
            _fs_delete(spark, p)
        return
    _write_text(
        spark, p,
        json.dumps({"n_generations": int(n_generations)}, sort_keys=True),
    )


def _ledger_retention(spark, table_path: str) -> int | None:
    p = f"{table_path}/{_LEDGER_RETENTION_CONF}"
    if not _fs_exists(spark, p):
        return None
    return int(json.loads(_read_text(spark, p))["n_generations"])


def _retrying_merge(fn, max_conflict_rebases: int):
    """OVERLAP FALLBACK (Delta's behavior for non-disjoint
    ConcurrentAppend, r8 verdict #3): when the cheap disjoint-
    partition REBASE inside ``_commit_rebasing`` refuses (overlapping
    write sets, DV on either side) or the claim never resolves, retry
    the WHOLE merge from scratch against the winner's snapshot —
    arbitration re-reads the new current table, partitions are
    recomputed, and last-writer-wins semantics hold.  Bounded by the
    same ``max_conflict_rebases`` budget as the rebase loop (total
    work <= (budget+1) merge computations); with a budget of 0 the
    first conflict propagates exactly as before."""
    tries = max(0, int(max_conflict_rebases))
    last: SnapshotWriteConflict | None = None
    for _ in range(tries + 1):
        try:
            return fn()
        except SnapshotWriteConflict as e:
            last = e
    assert last is not None
    raise last


def _snapshot_merge_upsert_once(
    spark: SparkSession,
    table_path: str,
    incoming: DataFrame,
    key: str = "parent_id",
    partition_cols: list[str] | None = None,
    schema_evolution: str = "merge",
    optimize_write: bool = False,
    max_conflict_rebases: int = 0,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    pinned_cur: int | None = None,
) -> int:
    """MERGE with a manifest-pointer commit; returns the committed
    generation number.

    ``pinned_cur`` lets a COMPOSED write path (``snapshot_update``)
    that already derived its incoming rows from one pinned generation
    hand that SAME generation in: the merge's ledger/identity/existing
    reads and expected_cur all use it, so a rival landing between the
    caller's pin and this commit surfaces as ``SnapshotWriteConflict``
    instead of silently merging rows computed against a stale base.  Same keyed delete-then-insert semantics as
    ``upsert.merge_upsert`` (equality property-tested), same
    O(affected-partitions) write set, but the commit point is one
    atomic rename and concurrent readers are never torn.

    ``schema_evolution``: ``"merge"`` (default, the swap sink's
    contract) aligns by name — incoming may add columns, old rows read
    them back as NULL; ``"strict"`` is Delta's schema ENFORCEMENT:
    incoming columns must be a subset of the table's with identical
    types, or ``SnapshotSchemaMismatch`` is raised before anything is
    written (missing incoming columns still land as NULL).

    ``optimize_write`` (the Delta optimized-writes knob): repartition
    the write set by the partition columns before writing, so each
    partition directory gets ONE right-sized file per commit instead
    of one sliver per upstream task — the small-file problem fixed at
    write time rather than by compaction.  Costs one extra shuffle of
    the increment; leave off when upstream partitioning is already
    aligned."""
    if schema_evolution not in ("merge", "strict"):
        raise ValueError(
            f"schema_evolution must be 'merge' or 'strict', got "
            f"{schema_evolution!r}"
        )
    _commit_recover(spark, table_path)
    _claim_recover(spark, table_path)
    # ONE pinned base generation per attempt (r10 advisor, medium):
    # the txn ledger, the identity high-water mark, the existing
    # relation, and the commit's expected_cur all derive from THIS
    # read — a rival landing at any later point surfaces as a commit
    # conflict and _retrying_merge re-runs the whole attempt against
    # the winner, instead of silently dropping the rival's ledger
    # entries or colliding on identity ids.
    cur = (
        pinned_cur if pinned_cur is not None
        else _current_gen(spark, table_path)
    )
    # IDEMPOTENT WRITES (Delta txnAppId/txnVersion): each committed
    # manifest carries a per-app high-water version ledger; a merge
    # whose (app, version) is already recorded is a RE-DELIVERY (a
    # restarted streaming micro-batch, a retried orchestrator task)
    # and must be a no-op — this is what makes foreachBatch into the
    # snapshot sink exactly-once under at-least-once delivery.
    skip_gen, txn_ledger, txn_gens = _txn_gate(
        spark, table_path, txn_app_id, txn_version, cur
    )
    if skip_gen is not None:
        return skip_gen
    incoming = _apply_generated(spark, table_path, incoming)
    incoming = _apply_identity(spark, table_path, incoming, key, at_gen=cur)
    # identity values were minted off THIS base snapshot's high-water
    # mark — a silent disjoint-partition rebase would let a rival
    # derive the same mark and collide; force retry-the-merge instead.
    # Same rule for the txn ledger: a rebase would overwrite the
    # rival's ledger entries with our base-derived map, so idempotent
    # writers re-run the merge against the winner instead.
    id_refuse = (
        "identity high-water derived from the base snapshot"
        if _identity_conf(spark, table_path) is not None
        else (
            "txn ledger derived from the base snapshot"
            if txn_app_id is not None
            else None
        )
    )

    def _x(extra: dict | None) -> dict | None:
        if txn_app_id is None:
            return extra
        out = dict(extra or {})
        out["txn"] = txn_ledger
        out["txn_gen"] = txn_gens
        return out
    _validate_constraints(spark, table_path, incoming)
    _fs_mkdirs(spark, f"{table_path}/_manifests")
    gen = (cur or 0) + 1
    gname = _gen_name(gen)
    new_dir = _gen_dir(table_path, gname)

    if cur is None:
        if partition_cols and incoming.isEmpty():
            # a partitioned empty write leaves no partition dirs (and
            # no schema) — there is nothing to commit or read back
            raise ValueError(
                "cannot initialize a partitioned snapshot table from "
                "an empty DataFrame"
            )
        first = incoming
        if optimize_write and partition_cols:
            first = first.repartition(*[F.col(c) for c in partition_cols])
        writer = first.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(new_dir)
        _maybe_write_stats(spark, table_path, gname, new_dir, schema=first.schema)
        rels = (
            _list_partition_rels(spark, new_dir, len(partition_cols))
            if partition_cols
            else [""]
        )
        return _commit_rebasing(
            spark, table_path, gen,
            {r: gname for r in rels},
            expected_cur=cur,
            extra=_x(_with_schema(None, first, partition_cols)),
            max_rebases=max_conflict_rebases,
            refuse_rebase=id_refuse,
        )

    existing = read_snapshot_table(spark, table_path, at_gen=cur)
    if schema_evolution == "strict":
        _enforce_schema(existing, incoming)
    manifest = _read_manifest(spark, table_path, cur)

    if not partition_cols:
        out = merged_view(existing, incoming, key)
        out.write.mode("overwrite").parquet(new_dir)
        _maybe_write_stats(spark, table_path, gname, new_dir, schema=out.schema)
        return _commit_rebasing(
            spark, table_path, gen, {"": gname}, expected_cur=cur,
            extra=_x(_with_schema(
                _carry_dv_ref(
                    spark, table_path, manifest, {"": gname}, gen
                ),
                out, prev=manifest,
            )),
            max_rebases=max_conflict_rebases,
            refuse_rebase=id_refuse,
        )

    keys = incoming.select(key).distinct()
    inc_parts = incoming.select(*partition_cols).distinct()
    exist_parts = (
        existing.join(F.broadcast(keys), on=key, how="left_semi")
        .select(*partition_cols)
        .distinct()
    )
    affected = [
        tuple(r[c] for c in partition_cols)
        for r in inc_parts.unionByName(exist_parts).distinct().collect()
    ]
    if not affected:
        return cur  # empty increment: the old snapshot stands

    def _match(values):
        terms = [
            F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
            for c, v in zip(partition_cols, values)
        ]
        return functools.reduce(lambda a, b: a & b, terms)

    pred = functools.reduce(lambda a, b: a | b, [_match(v) for v in affected])
    kept = existing.filter(pred).join(
        F.broadcast(keys), on=key, how="left_anti"
    )
    out = kept.unionByName(incoming, allowMissingColumns=True)
    if optimize_write:
        out = out.repartition(*[F.col(c) for c in partition_cols])
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(new_dir)
    _maybe_write_stats(spark, table_path, gname, new_dir, schema=out.schema)

    affected_rels = {_partition_rel_path(partition_cols, v) for v in affected}
    written = _list_partition_rels(spark, new_dir, len(partition_cols))
    partitions = {
        r: g for r, g in manifest["partitions"].items()
        if r not in affected_rels
    }
    partitions.update({r: gname for r in written})
    return _commit_rebasing(
        spark, table_path, gen, partitions, expected_cur=cur,
        extra=_x(_with_schema(
            _carry_dv_ref(spark, table_path, manifest, partitions, gen),
            out, partition_cols, prev=manifest,
        )),
        max_rebases=max_conflict_rebases,
        refuse_rebase=id_refuse,
    )



def snapshot_merge_upsert(
    spark: SparkSession,
    table_path: str,
    incoming: DataFrame,
    key: str = "parent_id",
    partition_cols: list[str] | None = None,
    schema_evolution: str = "merge",
    optimize_write: bool = False,
    max_conflict_rebases: int = 0,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """See ``_snapshot_merge_upsert_once`` for the merge contract.
    ``max_conflict_rebases`` buys BOTH concurrency lanes: disjoint-
    partition rivals rebase cheaply inside the commit; overlapping
    rivals fall back to retrying the whole merge against the winner's
    snapshot (``_retrying_merge``) — Delta's conflict-resolution
    ladder.

    ``txn_app_id``/``txn_version`` are Delta's IDEMPOTENT-WRITES knobs
    (txnAppId/txnVersion): each commit records a per-app high-water
    version in the manifest (carried forward by every later commit);
    a merge whose version is <= the recorded one is a re-delivery and
    returns the current generation WITHOUT writing.  This is the
    exactly-once contract for ``foreachBatch`` streaming into the
    snapshot sink (streaming/micro_batch.stream_into_snapshot): Spark
    re-runs a micro-batch whose checkpoint commit was lost, and the
    ledger makes the re-run a no-op instead of a double-apply.
    Ledger-carrying merges never take the silent disjoint-partition
    rebase (a rebase would drop the rival's ledger entries); they
    re-run against the winner, which re-reads the merged ledger."""
    return _retrying_merge(
        lambda: _snapshot_merge_upsert_once(
            spark, table_path, incoming, key=key,
            partition_cols=partition_cols,
            schema_evolution=schema_evolution,
            optimize_write=optimize_write,
            max_conflict_rebases=max_conflict_rebases,
            txn_app_id=txn_app_id,
            txn_version=txn_version,
        ),
        max_conflict_rebases,
    )


def _snapshot_merge_when_once(
    spark: SparkSession,
    table_path: str,
    incoming: DataFrame,
    key: str = "parent_id",
    partition_cols: list[str] | None = None,
    matched_update: str | None = None,
    matched_delete: str | None = None,
    insert_unmatched: bool = True,
    insert_condition: str | None = None,
    by_source_delete: str | None = None,
    by_source_update: dict[str, str] | None = None,
    by_source_update_condition: str | None = None,
    by_source_scope: str | None = None,
    max_conflict_rebases: int = 0,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """CONDITIONAL MERGE — the full Delta/SQL:2003 MERGE form, on top
    of the same manifest-pointer commit:

        WHEN MATCHED AND <matched_delete>  THEN DELETE
        WHEN MATCHED AND <matched_update>  THEN UPDATE SET * (source)
        WHEN MATCHED                       THEN keep target row
        WHEN NOT MATCHED AND <insert_condition> THEN INSERT *
                                           (if ``insert_unmatched``)
        WHEN NOT MATCHED BY SOURCE AND <by_source_delete> THEN DELETE
        WHEN NOT MATCHED BY SOURCE AND <by_source_update_condition>
                                           THEN UPDATE SET <by_source_update>
        WHEN NOT MATCHED BY SOURCE         THEN keep target row

    Conditions are SQL boolean expressions over BOTH sides via the
    ``t``/``s`` aliases (e.g. ``"s.ts > t.ts"`` — last-writer-wins
    by timestamp; ``"s.tombstone"`` — CDC-style delete markers).
    ``matched_update=None`` means unconditional update (plain upsert
    for matched rows); delete wins over update when both match, as in
    Delta's clause ordering.  ``insert_condition`` (over ``s.*``)
    gates inserts — the CDC idiom ``NOT s.tombstone`` makes unmatched
    delete markers no-ops instead of resurrecting rows.  The source
    must be key-unique (multiple matches per target row fan the
    full-outer join out), exactly Delta MERGE's own precondition.

    WHEN NOT MATCHED BY SOURCE (Delta 2.3 / SQL:2003 completeness —
    clauses over TARGET rows whose key is absent from the source;
    only ``t.*`` is in scope, source columns are all NULL there):
    ``by_source_delete`` is the full-sync idiom (replicate a system
    of record: anything the source no longer has dies — pass
    ``"true"`` for unconditional); ``by_source_update`` marks rows
    stale instead, as {column: SQL expr over ``t``} applied when
    ``by_source_update_condition`` (default unconditional) holds.
    Delete wins over update, mirroring the matched-clause ordering;
    NULL conditions never fire a clause (same 3VL rule).

    Scale: by-source clauses must SEE every target row — the merge
    becomes table-wide, exactly as Delta's own by-source merges scan
    the whole target.  ``by_source_scope`` (SQL predicate over
    partition/data columns, evaluated on the target) bounds that:
    rows OUTSIDE the scope are kept verbatim and their partitions are
    not rewritten, so a daily full-sync of one tenant/date-range
    stays O(scope), not O(table).  A by-source clause whose condition
    could fire outside the scope is the caller's contract violation —
    the scope is a partition-pruning promise, stated here because at
    100 TB it is the difference between a metadata-sized commit and
    rewriting every partition.

    Scale shape otherwise: identical to ``snapshot_merge_upsert`` —
    only partitions holding matched keys or receiving inserts rewrite
    (O(affected), never O(table)); the row arbitration is ONE
    full-outer join on the key inside those partitions, resolved
    column-wise with no UDF.  Incoming must carry the table's exact
    column set (conditional row arbitration has no meaningful NULL
    fill for absent columns — use snapshot_merge_upsert's schema
    evolution first if the schema must move).  ``max_conflict_rebases``
    enables the disjoint-partition rebase (``_commit_rebasing``)."""
    has_bs = bool(by_source_delete) or bool(by_source_update)
    if by_source_update and key in by_source_update:
        raise ValueError(
            "by_source_update must not rewrite the merge key "
            f"{key!r} (key mutation breaks the key-unique contract)"
        )
    _commit_recover(spark, table_path)
    _claim_recover(spark, table_path)
    # one pinned base generation per attempt — ledger, identity
    # high-water, existing relation, and expected_cur all derive from
    # it (r10 advisor, medium; see _snapshot_merge_upsert_once)
    cur = _current_gen(spark, table_path)
    # idempotent writes: same ledger gate as snapshot_merge_upsert —
    # a CDC stream applying conditional merges per micro-batch gets
    # exactly-once re-delivery semantics on this path too
    skip_gen, txn_ledger, txn_gens = _txn_gate(
        spark, table_path, txn_app_id, txn_version, cur
    )
    if skip_gen is not None:
        return skip_gen

    def _x(extra: dict | None) -> dict | None:
        if txn_ledger is None:
            return extra
        out = dict(extra or {})
        out["txn"] = txn_ledger
        out["txn_gen"] = txn_gens
        return out

    if cur is None:
        if not insert_unmatched:
            raise FileNotFoundError(
                f"no committed snapshot at {table_path}"
            )
        # the WHEN NOT MATCHED clause gates the FIRST batch too (r10
        # advisor, medium): on an empty table every row is an insert
        # candidate, so insert_condition (evaluated over s.* — the
        # CDC idiom `NOT s.tombstone`) must filter it BEFORE the
        # delegation to the plain upsert, or first-batch tombstones
        # would be resurrected as rows.  NULL conditions never fire
        # the clause (same 3VL rule as the joined path).
        inc0 = incoming
        if insert_condition:
            inc0 = incoming.alias("s").filter(
                F.coalesce(F.expr(insert_condition), F.lit(False))
            )
        return snapshot_merge_upsert(
            spark, table_path, inc0, key=key,
            partition_cols=partition_cols,
            txn_app_id=txn_app_id, txn_version=txn_version,
        )
    existing = read_snapshot_table(spark, table_path, at_gen=cur)
    # GENERATED ALWAYS AS IDENTITY binds on this write path too (r9
    # advisor, low): the source must not carry the column; matched
    # rows keep the TARGET's identity regardless of the update clause,
    # and inserted rows get fresh engine-assigned ids minted off the
    # committed high-water mark BEFORE the join (so the arbitration
    # below stays a plain column pick).
    idc = _identity_conf(spark, table_path)
    id_col = idc["column"] if idc else None
    if idc:
        if id_col in incoming.columns:
            raise SnapshotIdentityViolation(
                f"{id_col!r} is GENERATED ALWAYS AS IDENTITY — the "
                "merge source must not supply it"
            )
        if by_source_update and id_col in by_source_update:
            raise SnapshotIdentityViolation(
                f"by_source_update must not rewrite the identity "
                f"column {id_col!r}"
            )
        from .ranking import distributed_row_number

        hwm = _identity_hwm(existing, id_col, idc["start"], idc["step"])
        ex_keys = existing.select(key).distinct()
        matched_inc = incoming.join(
            ex_keys, on=key, how="left_semi"
        ).withColumn(id_col, F.lit(None).cast("long"))
        new_inc = distributed_row_number(
            incoming.join(ex_keys, on=key, how="left_anti"),
            [F.asc(key)],
            rank_col="__identity_rn",
        ).withColumn(
            id_col,
            (F.lit(hwm) + F.lit(idc["step"]) * F.col("__identity_rn"))
            .cast("long"),
        ).drop("__identity_rn")
        incoming = matched_inc.unionByName(new_inc)
    if sorted(existing.columns) != sorted(incoming.columns):
        raise SnapshotSchemaMismatch(
            "snapshot_merge_when needs identical column sets; table "
            f"has {sorted(existing.columns)}, incoming "
            f"{sorted(incoming.columns)}"
        )
    if by_source_update:
        bad = sorted(set(by_source_update) - set(existing.columns))
        if bad:
            raise ValueError(
                f"by_source_update targets unknown columns {bad}"
            )
    # CHECK constraints bind on every write path, conditional or not
    _validate_constraints(spark, table_path, incoming)
    manifest = _read_manifest(spark, table_path, cur)
    gen = cur + 1
    gname = _gen_name(gen)
    new_dir = _gen_dir(table_path, gname)
    cols = existing.columns

    def _arbitrate(target: DataFrame) -> DataFrame:
        # __bs_scope rides along from the PRE-join target relation so
        # by_source_scope can use bare column names (post-join they
        # are ambiguous between the t/s aliases)
        target = target.withColumn(
            "__bs_scope",
            F.coalesce(F.expr(by_source_scope), F.lit(False))
            if (has_bs and by_source_scope) else F.lit(has_bs),
        )
        t, s = target.alias("t"), incoming.alias("s")
        j = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
        t_here = F.col(f"t.{key}").isNotNull()
        s_here = F.col(f"s.{key}").isNotNull()
        matched = t_here & s_here
        t_only = t_here & ~s_here
        # SQL/Delta MERGE: a clause condition that evaluates to NULL
        # means the clause does NOT fire (three-valued logic never
        # deletes/updates/inserts a row).  Without the coalesce,
        # "s.tombstone" with a NULL tombstone made `keep` NULL and
        # filter(keep) silently DELETED the matched row.
        del_c = (
            F.coalesce(F.expr(matched_delete), F.lit(False))
            if matched_delete else F.lit(False)
        )
        upd_c = (
            F.coalesce(F.expr(matched_update), F.lit(False))
            if matched_update else F.lit(True)
        )
        ins_c = (
            F.coalesce(F.expr(insert_condition), F.lit(False))
            if insert_condition else F.lit(True)
        )
        bs_on = F.col("t.__bs_scope")
        bs_del_c = bs_on & (
            F.coalesce(F.expr(by_source_delete), F.lit(False))
            if by_source_delete else F.lit(False)
        )
        bs_upd_c = bs_on & F.lit(bool(by_source_update)) & (
            F.coalesce(F.expr(by_source_update_condition), F.lit(False))
            if by_source_update_condition else F.lit(True)
        )
        keep = F.when(matched, ~del_c).when(t_here, ~bs_del_c).otherwise(
            F.lit(bool(insert_unmatched)) & ins_c
        )
        use_source = F.when(matched, ~del_c & upd_c).otherwise(~t_here)
        sets = by_source_update or {}

        def _pick(c):
            if idc and c == id_col:
                # identity survives every matched clause: a row whose
                # target side exists keeps its committed id; only true
                # inserts read the pre-minted source id
                return F.when(t_here, F.col(f"t.{c}")).otherwise(
                    F.col(f"s.{c}")
                )
            if c in sets:
                return F.when(
                    t_only & bs_upd_c, F.expr(sets[c])
                ).otherwise(
                    F.when(use_source, F.col(f"s.{c}"))
                    .otherwise(F.col(f"t.{c}"))
                )
            return F.when(use_source, F.col(f"s.{c}")).otherwise(
                F.col(f"t.{c}")
            )

        out = j.filter(keep).select(*[_pick(c).alias(c) for c in cols])
        return out

    if not partition_cols:
        out = _arbitrate(existing)
        out.write.mode("overwrite").parquet(new_dir)
        _maybe_write_stats(spark, table_path, gname, new_dir, schema=out.schema)
        return _commit_rebasing(
            spark, table_path, gen, {"": gname}, expected_cur=cur,
            extra=_x(_with_schema(
                _carry_dv_ref(
                    spark, table_path, manifest, {"": gname}, gen
                ),
                out, prev=manifest,
            )),
            op="merge_when", max_rebases=max_conflict_rebases,
            refuse_rebase=(
                "identity high-water derived from the base snapshot"
                if idc else (
                    "txn ledger derived from the base snapshot"
                    if txn_ledger is not None else None
                )
            ),
        )

    keys = incoming.select(key).distinct()
    inc_parts = incoming.select(*partition_cols).distinct()
    exist_parts = (
        existing.join(F.broadcast(keys), on=key, how="left_semi")
        .select(*partition_cols)
        .distinct()
    )
    all_parts = inc_parts.unionByName(exist_parts)
    if has_bs:
        # by-source clauses examine every in-scope target row, so the
        # scope's partitions join the rewrite set (the whole table
        # when no scope is given — Delta's own by-source behavior)
        scoped = (
            existing.filter(F.expr(by_source_scope))
            if by_source_scope else existing
        )
        all_parts = all_parts.unionByName(
            scoped.select(*partition_cols).distinct()
        )
    affected = [
        tuple(r[c] for c in partition_cols)
        for r in all_parts.distinct().collect()
    ]
    if not affected:
        return cur

    def _match(values):
        terms = [
            F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
            for c, v in zip(partition_cols, values)
        ]
        return functools.reduce(lambda a, b: a & b, terms)

    pred = functools.reduce(
        lambda a, b: a | b, [_match(v) for v in affected]
    )
    out = _arbitrate(existing.filter(pred))
    out.write.mode(
        "overwrite"
    ).partitionBy(*partition_cols).parquet(new_dir)
    _maybe_write_stats(spark, table_path, gname, new_dir, schema=out.schema)
    affected_rels = {
        _partition_rel_path(partition_cols, v) for v in affected
    }
    written = _list_partition_rels(spark, new_dir, len(partition_cols))
    partitions = {
        r: g for r, g in manifest["partitions"].items()
        if r not in affected_rels
    }
    partitions.update({r: gname for r in written})
    return _commit_rebasing(
        spark, table_path, gen, partitions, expected_cur=cur,
        extra=_x(_with_schema(
            _carry_dv_ref(spark, table_path, manifest, partitions, gen),
            out, partition_cols, prev=manifest,
        )),
        op="merge_when", max_rebases=max_conflict_rebases,
        refuse_rebase=(
            "identity high-water derived from the base snapshot"
            if idc else (
                "txn ledger derived from the base snapshot"
                if txn_ledger is not None else None
            )
        ),
    )



def snapshot_merge_when(
    spark: SparkSession,
    table_path: str,
    incoming: DataFrame,
    key: str = "parent_id",
    partition_cols: list[str] | None = None,
    matched_update: str | None = None,
    matched_delete: str | None = None,
    insert_unmatched: bool = True,
    insert_condition: str | None = None,
    by_source_delete: str | None = None,
    by_source_update: dict[str, str] | None = None,
    by_source_update_condition: str | None = None,
    by_source_scope: str | None = None,
    max_conflict_rebases: int = 0,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """See ``_snapshot_merge_when_once`` for the MERGE-clause
    contract (including WHEN NOT MATCHED BY SOURCE); overlap/claim
    conflicts retry the whole merge against the winner's snapshot
    (``_retrying_merge``).  ``txn_app_id``/``txn_version`` are the
    same idempotent-writes ledger as ``snapshot_merge_upsert`` — the
    CDC-stream idiom is foreachBatch -> snapshot_merge_when with the
    micro-batch id, making conditional-merge re-deliveries no-ops."""
    return _retrying_merge(
        lambda: _snapshot_merge_when_once(
            spark, table_path, incoming, key=key,
            partition_cols=partition_cols,
            matched_update=matched_update,
            matched_delete=matched_delete,
            insert_unmatched=insert_unmatched,
            insert_condition=insert_condition,
            by_source_delete=by_source_delete,
            by_source_update=by_source_update,
            by_source_update_condition=by_source_update_condition,
            by_source_scope=by_source_scope,
            max_conflict_rebases=max_conflict_rebases,
            txn_app_id=txn_app_id,
            txn_version=txn_version,
        ),
        max_conflict_rebases,
    )


def _snapshot_delete_keys_once(
    spark: SparkSession,
    table_path: str,
    keys: DataFrame,
    key: str = "parent_id",
    partition_cols: list[str] | None = None,
    mode: str = "rewrite",
    max_dv_rows: int = 2_000_000,
    max_conflict_rebases: int = 0,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """DELETE-by-key-set with the same commit protocol.

    ``mode="rewrite"`` (default) rewrites only partitions that hold
    doomed keys — O(affected partitions) of DATA moved per delete.

    ``mode="dv"`` is the MERGE-ON-READ path (Delta/Iceberg deletion
    vectors): no data file is touched at all — the commit records the
    doomed rows' (file, row-position) pairs in an immutable DV file
    the manifest references, and every reader anti-joins them out.
    At 100 TB this is the difference between rewriting a partition to
    delete ten rows and writing kilobytes of metadata; the rows are
    physically dropped (and the DV cleared) by the next rewrite of
    their partition — merge, OPTIMIZE, or ``snapshot_compact_
    partitions``, exactly Delta's PURGE.  The DV write path collects
    the doomed positions driver-side (bounded by ``max_dv_rows``,
    fail-fast above — a bigger delete should rewrite instead; a
    production port swaps the JSON for roaring-bitmap files without
    changing the protocol).

    ``max_conflict_rebases`` applies to the REWRITE path only (the
    disjoint-partition rebase, ``_commit_rebasing``); a DV commit's
    merged map was computed against the base snapshot's DV state, so
    DV-mode conflicts always re-run."""
    if mode not in ("rewrite", "dv"):
        raise ValueError(f"mode must be 'rewrite' or 'dv', got {mode!r}")
    _commit_recover(spark, table_path)
    _claim_recover(spark, table_path)
    # one pinned base generation per attempt (r10 advisor, medium;
    # see _snapshot_merge_upsert_once)
    cur = _current_gen(spark, table_path)
    # idempotent writes: the ledger gate covers deletes too (a CDC
    # stream's tombstone batches re-deliver like any other)
    skip_gen, txn_ledger, txn_gens = _txn_gate(
        spark, table_path, txn_app_id, txn_version, cur
    )
    if skip_gen is not None:
        return skip_gen

    def _x(extra: dict | None) -> dict | None:
        if txn_ledger is None:
            return extra
        out = dict(extra or {})
        out["txn"] = txn_ledger
        out["txn_gen"] = txn_gens
        return out

    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    existing = read_snapshot_table(spark, table_path, at_gen=cur)
    key_set = keys.select(key).distinct()
    gen = cur + 1
    gname = _gen_name(gen)
    new_dir = _gen_dir(table_path, gname)

    if mode == "dv":
        manifest = _read_manifest(spark, table_path, cur)
        dv = _dv_map(spark, table_path, manifest)
        by_gen: dict[str, list[str]] = {}
        for rel, g in manifest["partitions"].items():
            by_gen.setdefault(g, []).append(rel)
        hit_parts = []
        for g, rels in sorted(by_gen.items()):
            base = _gen_base(table_path, g)
            if rels == [""]:
                raw = spark.read.parquet(base)
            else:
                raw = _read_parquet_pinned(
                    spark, manifest, base,
                    [f"{base}/{r}" for r in sorted(rels)],
                )
            # apply EXISTING DVs first so re-deleting a dead row is a
            # no-op, then record the survivors that match.  Relativize
            # against the RESOLVED generation dir so a shallow clone's
            # absolute generation refs produce keys _apply_dv can
            # match on read (advisor r7: the old f"/{g}/" delimiter
            # never matched an absolute ref and the delete was
            # committed but invisible).
            live = _apply_dv(
                spark,
                raw.withColumn(
                    "__f",
                    F.concat(
                        F.lit(g + "/"),
                        F.substring_index(
                            F.col("_metadata.file_path"),
                            base.rstrip("/") + "/", -1,
                        ),
                    ),
                ).withColumn("__p", F.col("_metadata.row_index")),
                g,
                dv,
                base=base,
            )
            # renames apply before the key semi-join: files in
            # pre-rename generation dirs carry the OLD physical name
            # for a renamed (logical) key column
            live = _apply_renames(manifest, g, live)
            hit_parts.append(
                live.join(F.broadcast(key_set), on=key, how="left_semi")
                .select("__f", "__p")
            )
        hits = functools.reduce(lambda a, b: a.unionByName(b), hit_parts)
        rows = hits.groupBy("__f").agg(F.collect_list("__p").alias("ps")).collect()
        n = sum(len(r["ps"]) for r in rows)
        if n > max_dv_rows:
            raise ValueError(
                f"DV delete would record {n} rows (> max_dv_rows="
                f"{max_dv_rows}); use mode='rewrite' for deletes this "
                "large"
            )
        if n == 0:
            return cur  # nothing doomed: the old snapshot stands
        merged = {k: set(v) for k, v in dv.items()}
        for r in rows:
            merged.setdefault(r["__f"], set()).update(
                int(x) for x in r["ps"]
            )
        # the bound holds for the ACCUMULATED map, not just this
        # call's increment (advisor r6): every reader collects and
        # broadcasts the whole merged DV, so repeated small DV deletes
        # must not creep past the contract — compaction (OPTIMIZE /
        # snapshot_compact_partitions) physically drops the rows and
        # resets the map
        total = sum(len(s) for s in merged.values())
        if total > max_dv_rows:
            raise ValueError(
                f"accumulated deletion vectors would reach {total} rows "
                f"(> max_dv_rows={max_dv_rows}) after this delete; "
                "compact the table (snapshot_optimize / "
                "snapshot_compact_partitions) to fold the DVs into a "
                "rewrite, or use mode='rewrite' for this delete"
            )
        name = _write_dv(spark, table_path, gen, merged)
        _commit(
            spark, table_path, gen, dict(manifest["partitions"]),
            expected_cur=cur, extra=_x({"dv": name}), op="delete_dv",
        )
        return gen

    if not partition_cols:
        manifest = _read_manifest(spark, table_path, cur)
        existing.join(F.broadcast(key_set), on=key, how="left_anti").write.mode(
            "overwrite"
        ).parquet(new_dir)
        _maybe_write_stats(spark, table_path, gname, new_dir,
                           schema=existing.schema)
        _commit(
            spark, table_path, gen, {"": gname}, expected_cur=cur,
            extra=_x(_carry_dv_ref(
                spark, table_path, manifest, {"": gname}, gen
            )),
            op="delete",
        )
        return gen

    manifest = _read_manifest(spark, table_path, cur)
    affected = [
        tuple(r[c] for c in partition_cols)
        for r in existing.join(F.broadcast(key_set), on=key, how="left_semi")
        .select(*partition_cols)
        .distinct()
        .collect()
    ]
    if not affected:
        return cur

    def _match(values):
        terms = [
            F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
            for c, v in zip(partition_cols, values)
        ]
        return functools.reduce(lambda a, b: a & b, terms)

    pred = functools.reduce(lambda a, b: a | b, [_match(v) for v in affected])
    kept = existing.filter(pred).join(
        F.broadcast(key_set), on=key, how="left_anti"
    )
    kept.write.mode("overwrite").partitionBy(*partition_cols).parquet(new_dir)
    _maybe_write_stats(spark, table_path, gname, new_dir, schema=kept.schema)

    affected_rels = {_partition_rel_path(partition_cols, v) for v in affected}
    written = _list_partition_rels(spark, new_dir, len(partition_cols))
    partitions = {
        r: g for r, g in manifest["partitions"].items()
        if r not in affected_rels
    }
    partitions.update({r: gname for r in written})
    return _commit_rebasing(
        spark, table_path, gen, partitions, expected_cur=cur,
        extra=_x(_carry_dv_ref(spark, table_path, manifest, partitions, gen)),
        op="delete", max_rebases=max_conflict_rebases,
        refuse_rebase=(
            "txn ledger derived from the base snapshot"
            if txn_ledger is not None else None
        ),
    )



def snapshot_delete_keys(
    spark: SparkSession,
    table_path: str,
    keys: DataFrame,
    key: str = "parent_id",
    partition_cols: list[str] | None = None,
    mode: str = "rewrite",
    max_dv_rows: int = 2_000_000,
    max_conflict_rebases: int = 0,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """See ``_snapshot_delete_keys_once`` for the delete contract;
    conflicts retry the whole delete against the winner's snapshot
    (``_retrying_merge``) — in DV mode the vectors are recomputed
    against the new current manifest, which is why a DV commit never
    rebases in place.  ``txn_app_id``/``txn_version``: the same
    idempotent-writes ledger as the merge paths (tombstone batches
    re-deliver like any other micro-batch)."""
    return _retrying_merge(
        lambda: _snapshot_delete_keys_once(
            spark, table_path, keys, key=key,
            partition_cols=partition_cols, mode=mode,
            max_dv_rows=max_dv_rows,
            max_conflict_rebases=max_conflict_rebases,
            txn_app_id=txn_app_id,
            txn_version=txn_version,
        ),
        max_conflict_rebases,
    )


def snapshot_optimize(
    spark: SparkSession, table_path: str,
    partition_cols: list[str] | None = None,
    zorder_cols: list[str] | None = None,
    zorder_bits: int = 16,
    target_file_mb: int | None = None,
) -> int:
    """Fold every referenced generation into ONE (the OPTIMIZE of this
    format): read the snapshot, rewrite it wholesale as a new
    generation, commit.  Keeps ``read_snapshot_table``'s union shallow
    after many incremental merges; pair with ``snapshot_vacuum``.

    ``zorder_cols`` is the ``OPTIMIZE ... ZORDER BY`` analog: the
    rewrite clusters rows on the Morton curve over those columns
    (operators/layout.zorder_value) so parquet min/max footers prune
    multi-column range predicates — one stats pass + a sort folded
    into the rewrite the fold was doing anyway.

    ``target_file_mb`` is the OPTIMIZE target-file-size knob: the
    rewrite caps rows per output file at ``target_bytes / measured
    avg row bytes`` (from the CURRENT generation's parquet footprint
    — metadata listing + one count, no extra data pass), so a table
    of many merge slivers folds into right-sized files instead of one
    giant file per partition.  Right-sized means splittable scans and
    bounded task memory at 100 TB — the same reason every lakehouse
    OPTIMIZE has this knob."""
    _commit_recover(spark, table_path)
    _claim_recover(spark, table_path)
    cur = _current_gen(spark, table_path)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    existing = read_snapshot_table(spark, table_path)
    if zorder_cols:
        from gpt_rag_ingestion_spark.operators.layout import zorder_value

        stats = existing.agg(
            *[F.min(c).alias(f"min_{c}") for c in zorder_cols],
            *[F.max(c).alias(f"max_{c}") for c in zorder_cols],
        ).collect()[0]
        z = zorder_value(
            zorder_cols,
            {c: stats[f"min_{c}"] for c in zorder_cols},
            {c: stats[f"max_{c}"] for c in zorder_cols},
            zorder_bits,
        )
        existing = (
            existing.withColumn("__z", z)
            .repartitionByRange(
                max(spark.sparkContext.defaultParallelism, 1), "__z"
            )
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    gen = cur + 1
    gname = _gen_name(gen)
    new_dir = _gen_dir(table_path, gname)
    if target_file_mb:
        from gpt_rag_ingestion_spark.operators.upsert import (
            _list_parquet_files,
        )

        # measure ONLY the current manifest's referenced footprint:
        # a recursive table_path listing counts superseded generations
        # awaiting vacuum (overcount → undersized files) and misses a
        # clone's absolute-path generations (undercount)
        manifest_now = _read_manifest(spark, table_path, cur)
        by_gen_now: dict[str, list[str]] = {}
        for rel, g in manifest_now["partitions"].items():
            by_gen_now.setdefault(g, []).append(rel)
        total_bytes = 0
        for g, rels in by_gen_now.items():
            base = _gen_base(table_path, g)
            roots = [base] if rels == [""] else [
                f"{base}/{r}" for r in rels
            ]
            for root in roots:
                total_bytes += sum(
                    b for _p, b in _list_parquet_files(spark, root)
                )
        total_rows = existing.count()
        if total_rows > 0 and total_bytes > 0:
            rows_per_file = max(
                1,
                int(target_file_mb) * 1024 * 1024 * total_rows
                // total_bytes,
            )
            # bin-pack, not just cap: coalesce each table partition to
            # one task (the file-count FLOOR is task count), then let
            # maxRecordsPerFile split back up to the target.  The
            # z-order path keeps its range partitioning — its task
            # layout IS the clustering.
            if partition_cols and not zorder_cols:
                existing = existing.repartition(
                    *[F.col(c) for c in partition_cols]
                )
    writer = existing.write.mode("overwrite")
    if target_file_mb and total_rows > 0 and total_bytes > 0:
        writer = writer.option("maxRecordsPerFile", rows_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(new_dir)
    _maybe_write_stats(spark, table_path, gname, new_dir,
                       schema=existing.schema)
    rels = (
        _list_partition_rels(spark, new_dir, len(partition_cols))
        if partition_cols
        else [""]
    )
    _commit(
        spark, table_path, gen, {r: gname for r in rels},
        expected_cur=cur, op="optimize",
    )
    return gen


def snapshot_maybe_optimize(
    spark: SparkSession,
    table_path: str,
    max_generations: int = 16,
    partition_cols: list[str] | None = None,
) -> dict:
    """Compaction TRIGGER for a merge-maintained snapshot table — the
    fourth member of the engine's trigger family (sidecar counters,
    ANN fragment counts, leaf-file counts): cheap enough for every
    foreachBatch tick (one manifest read).  When the number of
    generations the current manifest references exceeds
    ``max_generations`` (each incremental merge adds one, and the
    reader unions one scan per generation), fold them with
    ``snapshot_optimize`` and GC with ``snapshot_vacuum``."""
    cur = _current_gen(spark, table_path)
    if cur is None:
        return {"optimized": False, "generations": 0}
    manifest = _read_manifest(spark, table_path, cur)
    n = len(set(manifest["partitions"].values()))
    if n <= max_generations:
        # still GC superseded generations (a full-rewrite merge leaves
        # its predecessor unreferenced) — the stream owns this table,
        # so no external reader can hold an old snapshot; standalone
        # users wanting retention call snapshot_vacuum on their own
        # schedule instead of this trigger
        gc = snapshot_vacuum(spark, table_path)
        return {"optimized": False, "generations": n, **gc}
    snapshot_optimize(spark, table_path, partition_cols=partition_cols)
    gc = snapshot_vacuum(spark, table_path)
    return {"optimized": True, "generations_before": n, **gc}


#: Registered shallow clones of a table live as pointer files under
#: <table>/_clones/ — vacuum reads them to protect still-shared
#: generations (Delta logs shallow clones for the same reason).
_CLONES_DIR = "_clones"


def _register_clone(spark, source_root: str, clone_path: str) -> None:
    """Breadcrumb at the SOURCE: '<source>/_clones/<id>.json' names a
    clone whose manifests may reference this table's generation dirs.
    Written at clone time; pruned by vacuum once the clone is gone or
    fully localized."""
    _fs_mkdirs(spark, f"{source_root}/{_CLONES_DIR}")
    name = f"{uuid.uuid4().hex[:12]}.json"
    _write_text(
        spark,
        f"{source_root}/{_CLONES_DIR}/{name}",
        json.dumps(
            {"clone_path": clone_path.rstrip("/")}, sort_keys=True
        ),
    )


_INFLIGHT_DIR = "_inflight"


def _register_inflight(spark, table_path: str, gnames: set[str]) -> str | None:
    """Breadcrumb protecting a REBASING writer's staged-but-not-yet-
    referenced generation dirs from vacuum (r8 advisor): once a rival
    commits generation N, a loser's dir named gen-N drops inside
    vacuum's `<= cur` in-flight guard while the loser is still
    rebasing onto the winner.  `_inflight/<id>.json` names the staged
    dirs; vacuum skips them while the breadcrumb's mtime is lease-
    fresh, and prunes stale breadcrumbs (a SIGKILLed rebaser) after
    ``CLAIM_LEASE_MS``.  Returns the breadcrumb path (callers remove
    it in a finally)."""
    local = {g for g in gnames if g.startswith("gen-")}
    if not local:
        return None
    _fs_mkdirs(spark, f"{table_path}/{_INFLIGHT_DIR}")
    path = f"{table_path}/{_INFLIGHT_DIR}/{uuid.uuid4().hex[:12]}.json"
    _write_text(spark, path, json.dumps({"gens": sorted(local)}))
    return path


def _inflight_protected_gens(spark, table_path: str) -> set[str]:
    """Generation dir names named by a lease-fresh ``_inflight``
    breadcrumb; stale breadcrumbs are pruned in passing."""
    fs, d = _hfs(spark, f"{table_path}/{_INFLIGHT_DIR}")
    if not fs.exists(d):
        return set()
    out: set[str] = set()
    now = _now_ms(spark)
    for st in fs.listStatus(d):
        if not st.getPath().getName().endswith(".json"):
            continue
        if now - st.getModificationTime() > CLAIM_LEASE_MS:
            try:
                fs.delete(st.getPath(), False)
            except Exception:
                pass
            continue
        try:
            out |= set(
                json.loads(
                    _read_text(spark, st.getPath().toString())
                ).get("gens", [])
            )
        except Exception:
            # unreadable-but-fresh (mid-write): protect nothing from
            # it, but leave it for the lease to age out
            continue
    return out


def _clone_protected_gens(
    spark, table_path: str, prune: bool = True
) -> set[str]:
    """Generation dir NAMES of ``table_path`` still referenced by any
    REGISTERED LIVE clone — the set ``snapshot_vacuum`` must not
    delete, whatever its retention knobs say.  Every manifest the
    clone currently retains counts (the clone's own vacuum decides
    how many that is).  Stale registrations — clone deleted, or fully
    localized by OPTIMIZE so no absolute ref into this table remains —
    are pruned as a side effect, so the guard is self-cleaning."""
    root = table_path.rstrip("/")
    fs, cdir = _hfs(spark, f"{root}/{_CLONES_DIR}")
    if not fs.exists(cdir):
        return set()
    # compare refs FULLY QUALIFIED through the Hadoop FileSystem (r8
    # advisor): a clone registered via file:/... refs and a vacuum
    # invoked with a plain /... root (or vice versa) must still match,
    # or the registration reads as empty and gets pruned after the
    # lease — silently re-exposing still-shared generations.
    def _qual(path: str) -> str:
        try:
            qfs, qp = _hfs(spark, path)
            return qfs.makeQualified(qp).toString().rstrip("/")
        except Exception:
            return path.rstrip("/")

    qroot = _qual(root)
    qual_cache: dict[str, str] = {}
    protected: set[str] = set()
    for st in fs.listStatus(cdir):
        name = st.getPath().getName()
        if not name.endswith(".json"):
            continue
        try:
            reg = json.loads(
                _read_text(spark, f"{root}/{_CLONES_DIR}/{name}")
            )
            cpath = str(reg["clone_path"])
        except Exception:
            if prune:
                fs.delete(st.getPath(), False)
            continue
        refs: set[str] = set()
        # scan the clone's manifest FILES, not just its committed
        # pointer: a clone mid-commit has claimed its manifest but not
        # yet swapped _current, and its refs must already protect
        mfs, mdir = _hfs(spark, f"{cpath}/_manifests")
        if mfs.exists(mdir):
            for mst in mfs.listStatus(mdir):
                mn = mst.getPath().getName()
                if not mn.endswith(".json"):
                    continue
                try:
                    m = json.loads(
                        _read_text(spark, f"{cpath}/_manifests/{mn}")
                    )
                except Exception:
                    continue
                for g in m.get("partitions", {}).values():
                    if not isinstance(g, str) or g.startswith("gen-"):
                        continue  # clone-local dirs are never refs
                    qg = qual_cache.get(g)
                    if qg is None:
                        qg = qual_cache[g] = _qual(g)
                    if qg.startswith(qroot + "/"):
                        refs.add(qg[len(qroot) + 1:])
        if refs:
            protected |= refs
        elif prune and (
            _now_ms(spark) - st.getModificationTime() > CLAIM_LEASE_MS
        ):
            # clone gone or fully localized: registration is stale.
            # The lease-sized grace keeps a registration written
            # instants before the clone's first manifest from being
            # reaped mid-clone.
            fs.delete(st.getPath(), False)
    return protected


def snapshot_vacuum(
    spark: SparkSession, table_path: str, keep_snapshots: int = 1,
    retain_hours: float | None = None,
    dry_run: bool = False,
) -> dict:
    """Garbage-collect unreferenced generations and superseded
    manifests.  The ONLY destructive operation in the format — the
    retention knob of every lakehouse, minimal form.

    ``keep_snapshots`` (≥ 1) retains the newest N committed snapshots:
    their manifests stay readable for TIME TRAVEL (``at_gen``) and
    every generation any retained manifest references survives.  The
    default 1 keeps only the current snapshot (most aggressive); raise
    it to give concurrent readers / auditors a window.

    ``retain_hours`` (Delta's `VACUUM ... RETAIN n HOURS`) ADDS
    age-based retention: every manifest whose COMMIT CLOCK
    (``committed_at_ms`` stamped in the manifest; file-mtime fallback
    for pre-r12 manifests) is within the window is kept too, whatever
    ``keep_snapshots`` says — the contract an auditor or a
    long-running reader relies on ("anything committed in the last N
    hours stays time-travelable"), and one that now survives an
    rsync/DR restore refreshing every mtime (where an mtime window
    would mis-age the history).  The two knobs compose as a union of
    retained sets.

    CLONE-AWARE: generations still referenced by a registered live
    shallow clone (``_clones/`` breadcrumbs written by
    ``snapshot_clone``) are never deleted, whatever the retention
    knobs say — branching a table and waiting out the source's
    retention cannot break the branch.  The guard is metadata-only
    (read each clone's manifests) and self-cleaning (stale
    registrations pruned once a clone dies or localizes).

    ``dry_run=True`` (Delta's ``VACUUM ... DRY RUN``): evaluate the
    FULL retention decision — clone guards, in-flight guards, age
    windows — and report what WOULD be removed (plus the doomed names
    under ``would_remove``), deleting nothing.  Clone-registration
    pruning is also suppressed, so a dry run has zero side effects."""
    cur = _current_gen(spark, table_path)
    if cur is None:
        return {"removed_gens": 0, "removed_manifests": 0}
    clone_protected = _clone_protected_gens(
        spark, table_path, prune=not dry_run
    )
    keep = max(1, int(keep_snapshots))
    # retained manifests = the newest `keep` that actually exist
    mdir_fs, mdir = _hfs(spark, f"{table_path}/_manifests")
    manifest_gens = []
    fresh: set[int] = set()
    cutoff = (
        None
        if retain_hours is None
        else _now_ms(spark) - int(float(retain_hours) * 3_600_000)
    )
    if mdir_fs.exists(mdir):
        for st in mdir_fs.listStatus(mdir):
            name = st.getPath().getName()
            if name.endswith(".json"):
                try:
                    g = int(name[:-5])
                except ValueError:
                    continue
                manifest_gens.append(g)
                if cutoff is not None:
                    ts = None
                    try:
                        ts = _read_manifest(spark, table_path, g).get(
                            "committed_at_ms"
                        )
                    except Exception:
                        ts = None
                    if ts is None:  # pre-r12 manifest: mtime fallback
                        ts = st.getModificationTime()
                    if int(ts) >= cutoff:
                        fresh.add(g)
    manifest_gens.sort(reverse=True)
    retained = {g for g in manifest_gens if g <= cur}
    retained = (
        set(sorted(retained, reverse=True)[:keep])
        | {cur}
        | {g for g in fresh if g <= cur}
    )
    referenced: set[str] = set()
    for g in retained:
        referenced |= set(
            _read_manifest(spark, table_path, g)["partitions"].values()
        )
    # the gen-number guard below no longer covers every in-flight
    # writer (r8 advisor): a REBASING loser's staged dir keeps its
    # ORIGINAL generation name, which drops to <= cur the instant its
    # rival commits — deleting it here would make the rebased commit
    # reference vanished files.  Rebasing writers register their
    # staged dirs in _inflight/ (lease-aged, self-pruning) and
    # re-verify the dirs exist before each rebased attempt.
    inflight_protected = _inflight_protected_gens(spark, table_path)
    fs, root = _hfs(spark, table_path)
    removed_gens = 0
    protected_for_clones = 0
    doomed_gens: list[str] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if (
            st.isDirectory()
            and name.startswith("gen-")
            and name not in referenced
            and name not in inflight_protected
            and int(name[4:12]) <= cur  # never touch an in-flight writer
        ):
            if name in clone_protected:
                protected_for_clones += 1
                continue
            if dry_run:
                doomed_gens.append(name)
                removed_gens += 1
                continue
            fs.delete(st.getPath(), True)
            _fs_delete(spark, _gen_stats_path(table_path, name))
            removed_gens += 1
    # EXTERNAL sidecars (ext-<digest>.json, written by
    # snapshot_convert_from_parquet collect_stats): vacuum never
    # deletes the caller-owned source directory itself, but once no
    # retained manifest references the external ref any more (a
    # rewrite localized it), its sidecar is garbage.  Self-describing:
    # each carries its ref in "gen_dir".
    sfs, sdir = _hfs(spark, f"{table_path}/{_STATS_DIR}")
    if sfs.exists(sdir):
        for st in sfs.listStatus(sdir):
            name = st.getPath().getName()
            if not (name.startswith("ext-") and name.endswith(".json")):
                continue
            try:
                ref = json.loads(
                    _read_text(spark, st.getPath().toString())
                ).get("gen_dir")
            except Exception:
                continue
            if ref is not None and ref not in referenced and not dry_run:
                sfs.delete(st.getPath(), False)
    removed_manifests = 0
    if mdir_fs.exists(mdir):
        for st in mdir_fs.listStatus(mdir):
            name = st.getPath().getName()
            if (
                name.endswith(".json")
                and int(name[:-5]) < cur
                and int(name[:-5]) not in retained
            ):
                removed_manifests += 1
                if dry_run:
                    continue
                mdir_fs.delete(st.getPath(), False)
    # deletion-vector files: keep those any retained manifest
    # references; the rest (superseded accumulations, crashed-commit
    # orphans with gen <= cur) are garbage
    dv_live = set()
    for g in retained:
        name = _read_manifest(spark, table_path, g).get("dv")
        if name:
            dv_live.add(name)
    dv_fs, dvdir = _hfs(spark, f"{table_path}/{_DV_DIR}")
    if dv_fs.exists(dvdir):
        for st in dv_fs.listStatus(dvdir):
            name = st.getPath().getName()
            if not name.endswith(".json") or name in dv_live:
                continue
            try:
                g = int(name.split("-")[0])
            except ValueError:
                continue
            if g <= cur:  # never touch an in-flight writer's DV
                if not dry_run:
                    dv_fs.delete(st.getPath(), False)
    out = {
        "removed_gens": removed_gens,
        "removed_manifests": removed_manifests,
        "protected_for_clones": protected_for_clones,
    }
    if dry_run:
        out["would_remove"] = sorted(doomed_gens)
    return out


def _changed_partitions(manifest_a: dict, manifest_b: dict) -> list[str]:
    """Relative partition paths whose generation mapping DIFFERS
    between two manifests.  Because generation directories are
    immutable, a partition mapped to the same generation in both
    snapshots provably holds identical rows — the diff below never
    reads it.  This is what makes the change feed O(changed
    partitions), not O(table)."""
    pa, pb = manifest_a["partitions"], manifest_b["partitions"]
    return sorted(r for r in set(pa) | set(pb) if pa.get(r) != pb.get(r))


def _read_partition_subset(
    spark, table_path: str, parts: dict, dv_map: dict | None = None,
    manifest: dict | None = None,
):
    """Read a {rel: gen-dir} subset of one manifest (same mechanics as
    read_snapshot_table, restricted; ``dv_map`` = that manifest's
    deletion vectors; ``manifest`` pins partition-column types to its
    stored schema).  Returns None for an empty subset."""
    if not parts:
        return None
    by_gen: dict[str, list[str]] = {}
    for rel, g in parts.items():
        by_gen.setdefault(g, []).append(rel)
    dfs = []
    for g, rels in sorted(by_gen.items()):
        base = _gen_base(table_path, g)
        if rels == [""]:
            raw = spark.read.parquet(base)
        else:
            raw = _read_parquet_pinned(
                spark, manifest or {}, base,
                [f"{base}/{r}" for r in sorted(rels)],
            )
        dfs.append(
            _apply_renames(
                manifest or {}, g, _apply_dv(spark, raw, g, dv_map or {}, base=base)
            )
        )
    return functools.reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def snapshot_changes(
    spark: SparkSession,
    table_path: str,
    from_gen: int,
    to_gen: int,
    key: str = "parent_id",
    include_preimages: bool = False,
) -> DataFrame:
    """CHANGE DATA FEED between two committed snapshots (the Delta
    `table_changes` / Iceberg incremental-read analog, scoped to this
    format): one row per key whose content differs, with
    ``_change_type`` in {'insert', 'update', 'delete'} — update and
    insert carry the POST-image, delete the PRE-image.

    ``include_preimages=True`` switches to Delta CDF's full schema:
    updates emit TWO rows, ``update_preimage`` (the FROM-side row) and
    ``update_postimage`` (the TO-side row) — exactly what downstream
    incremental view maintenance needs (removed = deletes +
    update_preimages, added = inserts + update_postimages; see
    operators/incremental.maintain_rollup).

    Scale shape: the manifests are compared driver-side and only
    partitions whose generation mapping CHANGED are read on either
    side (immutable generations make an equal mapping proof of equal
    content), then a full-outer join on (key, row digest) inside that
    subset emits the actual changes — rewritten-but-identical rows
    (a partition-grain merge rewrites every resident key) digest
    equal and drop out.  Cost is O(changed partitions) + one compact
    (key, digest) shuffle, independent of table size.

    Requires both manifests to still exist (``snapshot_vacuum`` is
    the retention boundary, exactly as for time travel)."""
    for g in (from_gen, to_gen):
        if not _fs_exists(spark, _manifest_path(table_path, g)):
            raise FileNotFoundError(
                f"no manifest for generation {g} at {table_path} "
                "(never committed, or removed by snapshot_vacuum)"
            )
    ma = _read_manifest(spark, table_path, from_gen)
    mb = _read_manifest(spark, table_path, to_gen)
    dva = _dv_map(spark, table_path, ma)
    dvb = _dv_map(spark, table_path, mb)
    changed = set(_changed_partitions(ma, mb))

    # a partition whose generation mapping is unchanged can still have
    # CHANGED CONTENT under merge-on-read: its files' deletion vectors
    # differ between the two snapshots
    gens_ab = sorted(
        set(ma["partitions"].values()) | set(mb["partitions"].values()),
        key=len, reverse=True,
    )

    def _dv_by_rel(dv):
        # gen refs may contain slashes (clone absolute paths): parse
        # keys by longest-prefix match, never split('/', 1)
        out: dict[str, dict] = {}
        for k, v in dv.items():
            gname = next(
                (g for g in gens_ab if k.startswith(g + "/")), None
            )
            if gname is None:
                continue
            rest = k[len(gname) + 1:]
            rel = "/".join(rest.split("/")[:-1])
            out.setdefault(rel, {})[k] = sorted(v)
        return out

    ra, rb = _dv_by_rel(dva), _dv_by_rel(dvb)
    changed |= {r for r in set(ra) | set(rb) if ra.get(r) != rb.get(r)}
    a = _read_partition_subset(
        spark, table_path,
        {r: g for r, g in ma["partitions"].items() if r in changed},
        dv_map=dva, manifest=ma,
    )
    b = _read_partition_subset(
        spark, table_path,
        {r: g for r, g in mb["partitions"].items() if r in changed},
        dv_map=dvb, manifest=mb,
    )
    # a diff SPANNING a column-mapping rename compares the FROM side
    # under its pre-rename LOGICAL names — align name-wise (the dirs
    # machinery already produced a consistent logical frame per side)
    # so the digest compares the same logical column, not NULL-vs-value
    if a is not None:
        for r in mb.get("renames") or []:
            if (
                from_gen < r.get("gen", 0) <= to_gen
                and r["from"] in a.columns
            ):
                if r["to"] is None:
                    a = a.drop(r["from"])
                elif r["to"] not in a.columns:
                    a = a.withColumnRenamed(r["from"], r["to"])
    if a is None and b is None:
        raise ValueError("no partitions changed and no schema available")
    cols = sorted(
        {c for df in (a, b) if df is not None for c in df.columns} - {key}
    )

    def prep(df, tag):
        if df is None:
            other = b if tag == "a" else a
            df = other.limit(0)
        for c in cols:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(None))
        digest = F.md5(F.to_json(F.struct(*[F.col(c) for c in cols])))
        return df.select(
            F.col(key),
            F.struct(*[F.col(c) for c in cols]).alias(f"_row{tag}"),
            digest.alias(f"_h{tag}"),
        )

    j = prep(a, "a").join(prep(b, "b"), on=key, how="full_outer")
    ct = (
        F.when(F.col("_ha").isNull(), F.lit("insert"))
        .when(F.col("_hb").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    out = j.filter(
        F.col("_ha").isNull()
        | F.col("_hb").isNull()
        | (F.col("_ha") != F.col("_hb"))
    ).withColumn("_change_type", ct)
    if not include_preimages:
        img = [
            F.when(
                F.col("_change_type") == "delete", F.col(f"_rowa.{c}")
            ).otherwise(F.col(f"_rowb.{c}")).alias(c)
            for c in cols
        ]
        return out.select(key, "_change_type", *img)
    pre = out.filter(F.col("_change_type") != "insert").select(
        key,
        F.when(F.col("_change_type") == "delete", F.lit("delete"))
        .otherwise(F.lit("update_preimage"))
        .alias("_change_type"),
        *[F.col(f"_rowa.{c}").alias(c) for c in cols],
    )
    post = out.filter(F.col("_change_type") != "delete").select(
        key,
        F.when(F.col("_change_type") == "insert", F.lit("insert"))
        .otherwise(F.lit("update_postimage"))
        .alias("_change_type"),
        *[F.col(f"_rowb.{c}").alias(c) for c in cols],
    )
    return pre.unionByName(post)


# ---------------------------------------------------------------------------
# DATA SKIPPING: per-file column statistics + bloom filters
# ---------------------------------------------------------------------------
#
# The read path above prunes at two grains already: the manifest maps
# PARTITIONS to generations (dir-level pruning) and parquet row-group
# footers prune inside a file once it is opened.  What is missing at
# 100 TB is the grain in between — deciding, from COMMIT-TIME METADATA
# ALONE, which files a predicate can touch, before any executor opens
# anything.  That is Delta's per-file stats / Iceberg's manifest
# column bounds.  Re-expressed here:
#
#     <table>/_stats_config.json      {"cols": [...], "bloom_cols": [...],
#                                      "bloom_bits": m, "bloom_hashes": k}
#     <table>/_stats/<gen-name>.json  per-FILE min/max/null-count for
#                                     each stats column, plus an
#                                     xxhash64 bloom bitmap per bloom
#                                     column — written BEFORE the
#                                     commit, immutable alongside the
#                                     generation directory it covers
#
# Stats are collected as ONE column-pruned Spark aggregation over the
# just-written generation, grouped on `_metadata.file_path` — cost is
# O(increment) in the stats columns only, never a second pass over the
# table.  Generations written before stats were enabled simply have no
# sidecar and are read unpruned (the Delta behavior for files with
# missing stats: no skip, never wrong).
#
# Readers: `snapshot_read_where` serves conjunctive RANGE predicates
# (skip a file when its [min,max] misses the range, or when the file
# is all-NULL for a range column — range predicates are
# null-rejecting); `snapshot_read_point` serves key IN (...) lookups
# through the per-file blooms (false positives re-filtered exactly,
# false negatives impossible — lookups hash with the same JVM
# xxhash64 the build used).  Both apply the exact residual filter, so
# pruning is a pure I/O optimization with oracle-checkable semantics
# (q170/q171).

_STATS_CONF = "_stats_config.json"
_STATS_DIR = "_stats"

#: min/max stats support exactly the types whose JSON round-trip
#: preserves ordering driver-side (decimals would compare as strings,
#: binary/nested have no total order worth a footer stat).
_STATS_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "string", "boolean", "date", "timestamp", "timestamp_ntz",
}


def _stat_jsonable(v):
    """Collected min/max → JSON, ordering-preserving: dates and
    timestamps become ISO-8601 strings (fixed-width date/time prefix,
    fractional seconds only extend — lexicographic order matches
    temporal order); everything else is a JSON native."""
    if isinstance(v, _dt.datetime) or isinstance(v, _dt.date):
        return v.isoformat(sep="T") if isinstance(v, _dt.datetime) else v.isoformat()
    return v


def snapshot_enable_stats(
    spark: SparkSession,
    table_path: str,
    cols: list[str],
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 4096,
    bloom_hashes: int = 3,
) -> None:
    """Turn on write-time file statistics for FUTURE generations.
    Idempotent overwrite; existing generations keep (lack of) their
    sidecars and are read unpruned — exactly how enabling stats late
    behaves in the real formats."""
    conf = {
        "cols": list(cols),
        "bloom_cols": list(bloom_cols or []),
        "bloom_bits": int(bloom_bits),
        "bloom_hashes": int(bloom_hashes),
    }
    _fs_mkdirs(spark, table_path)
    _write_text(spark, f"{table_path}/{_STATS_CONF}", json.dumps(conf, sort_keys=True))


def _stats_conf(spark, table_path: str) -> dict | None:
    p = f"{table_path}/{_STATS_CONF}"
    if not _fs_exists(spark, p):
        return None
    return json.loads(_read_text(spark, p))


def _gen_stats_path(table_path: str, gname: str) -> str:
    return f"{table_path}/{_STATS_DIR}/{gname}.json"


def _ext_stats_path(table_path: str, g: str) -> str:
    """Sidecar path for an EXTERNAL generation reference (a
    ``snapshot_convert_from_parquet`` adoption): the ref is an
    absolute directory OWNED BY THE CALLER, so its sidecar lives in
    OUR ``_stats/`` under a deterministic digest of the ref — never
    inside the caller's directory."""
    import hashlib

    h = hashlib.sha1(g.rstrip("/").encode("utf-8")).hexdigest()[:16]
    return f"{table_path}/{_STATS_DIR}/ext-{h}.json"


#: a snapshot generation directory name (``_gen_name``): the tail of
#: a shallow-clone's absolute reference matches this; a converted
#: external directory does not.
_GEN_NAME_RE = re.compile(r"gen-\d{8}-[0-9a-f]{8}$")


def _find_stats_sidecar(spark, table_path: str, g: str) -> dict | None:
    """Parsed stats sidecar for one manifest generation reference, or
    None (read unpruned — never wrong).  Three shapes:
    - local ref (bare dir name): our own ``_stats/<gname>.json``;
    - converted external ref (absolute, non-gen directory): the
      ``ext-<digest>.json`` sidecar ``snapshot_convert_from_parquet``
      collected (``collect_stats=True``), if any;
    - shallow-clone ref (absolute path to a SOURCE table's gen dir):
      the SOURCE's own sidecar next to it — sidecars are written
      before commit and immutable after, so borrowing the source's is
      exactly as safe as borrowing its data files, and clone reads
      prune without localizing first."""
    if "/" not in g:
        sp = _gen_stats_path(table_path, g)
    elif _GEN_NAME_RE.search(g.rstrip("/")):
        src_tbl, base = g.rstrip("/").rsplit("/", 1)
        sp = _gen_stats_path(src_tbl, base)
    else:
        sp = _ext_stats_path(table_path, g)
    if not _fs_exists(spark, sp):
        return None
    try:
        return json.loads(_read_text(spark, sp))
    except Exception:
        return None


def _maybe_write_stats(
    spark, table_path: str, gname: str, new_dir: str,
    schema=None,
) -> None:
    """Collect per-file stats for a just-written generation (one
    column-pruned aggregation over the increment) and persist the
    sidecar.  Called by every writer BETWEEN data write and commit, so
    a sidecar exists iff its generation's files are fully on disk; an
    uncommitted generation's sidecar is garbage vacuum removes with
    the directory.

    ``schema`` (the written frame's logical StructType) pins
    partition-column types for the read-back — without it, stats
    declared on a numeric-looking STRING partition column would
    record min/max as ints in some generations and strings in others,
    and ``_range_keeps``/``_bound_key`` comparisons across the mixed
    sidecars would be type-inconsistent."""
    conf = _stats_conf(spark, table_path)
    if not conf:
        return
    if schema is not None:
        from pyspark.sql.types import AtomicType

        with _no_partition_inference(spark):
            df = spark.read.parquet(new_dir)
        # pin ATOMIC columns only — the only read-back type drift is
        # partition-directory parsing, and partition columns are
        # atomic; nested columns can differ in nullability alone and
        # must not be touched
        for f in schema.fields:
            if (
                isinstance(f.dataType, AtomicType)
                and f.name in df.columns
                and df.schema[f.name].dataType != f.dataType
            ):
                df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
    else:
        df = spark.read.parquet(new_dir)
    cols = [c for c in conf["cols"] if c in df.columns]
    bcols = [c for c in conf.get("bloom_cols", []) if c in df.columns]
    if not cols and not bcols:
        return
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in cols:
        if types[c] not in _STATS_TYPES:
            raise TypeError(
                f"stats column {c!r} has unsupported type {types[c]!r}; "
                f"supported: {sorted(_STATS_TYPES)}"
            )
    # file path relative to the generation dir (the token in the name
    # makes `/<gname>/` unique in the URI).  An EXTERNAL gname
    # (absolute converted-from dir) delimits on its own full path —
    # partition dir names (``p=v``, no slashes) cannot re-embed it.
    delim = (
        gname.rstrip("/") + "/" if "/" in gname else f"/{gname}/"
    )
    rel = F.substring_index(
        F.col("_metadata.file_path"), delim, -1
    ).alias("__file")
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"__min__{c}"),
            F.max(c).alias(f"__max__{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls__{c}"),
        ]
    per_file = df.groupBy(rel).agg(*aggs).collect()
    # Blooms in a second column-pruned pass: explode the k positions
    # per row, then collect_set — map-side combine dedups before the
    # shuffle and the per-file state is bounded by the bitmap size m,
    # never by the row count (a collect_list of per-row arrays would
    # materialize O(rows*k) before dedup).
    m, k = int(conf.get("bloom_bits", 4096)), int(conf.get("bloom_hashes", 3))
    blooms: dict[str, dict[str, int]] = {c: {} for c in bcols}
    for c in bcols:
        pos = df.filter(F.col(c).isNotNull()).select(
            rel,
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(F.col(c), F.lit(i)), F.lit(m))
                        for i in range(k)
                    ]
                )
            ).alias("__p"),
        )
        for r in pos.groupBy("__file").agg(
            F.collect_set("__p").alias("__ps")
        ).collect():
            bits = 0
            for b in r["__ps"]:
                bits |= 1 << int(b)
            blooms[c][r["__file"]] = bits
    files: dict[str, dict] = {}
    for r in per_file:
        ent: dict = {"rows": r["__rows"], "cols": {}}
        for c in cols:
            ent["cols"][c] = {
                "min": _stat_jsonable(r[f"__min__{c}"]),
                "max": _stat_jsonable(r[f"__max__{c}"]),
                "nulls": r[f"__nulls__{c}"],
            }
        for c in bcols:
            ent.setdefault("bloom", {})[c] = format(
                blooms[c].get(r["__file"], 0), "x"
            )
        files[r["__file"]] = ent
    _fs_mkdirs(spark, f"{table_path}/{_STATS_DIR}")
    _write_text(
        spark,
        (
            _ext_stats_path(table_path, gname)
            if "/" in gname
            else _gen_stats_path(table_path, gname)
        ),
        json.dumps(
            {"gen_dir": gname, "bloom_bits": m, "bloom_hashes": k,
             "files": files},
            sort_keys=True,
        ),
    )


def _bound_key(v):
    """User-supplied range bound → the same normalized form
    `_stat_jsonable` stored, so driver-side comparisons are
    like-for-like."""
    return _stat_jsonable(v)


def _resolve_file_sets(spark, table_path: str, at_gen: int | None):
    """Manifest → per-generation (gen_ref, base_dir, live_rels,
    stats|None).  ``gen_ref`` is the manifest's generation reference
    verbatim (a clone's absolute path included) — DV keys are prefixed
    by it, so consumers must NOT re-derive it from base_dir.
    `stats` is the parsed sidecar restricted to files whose partition
    directory is still referenced by THIS manifest (a generation can
    hold partitions a later commit superseded)."""
    gen = at_gen if at_gen is not None else _current_gen(spark, table_path)
    if gen is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    manifest = _read_manifest(spark, table_path, gen)
    dv = _dv_map(spark, table_path, manifest)
    by_gen: dict[str, list[str]] = {}
    for rel, g in manifest["partitions"].items():
        by_gen.setdefault(g, []).append(rel)
    out = []
    for g, rels in sorted(by_gen.items()):
        # local refs read our sidecar; converted external refs read
        # the ext-digest sidecar collected at convert; clone refs
        # borrow the SOURCE table's sidecar (``_find_stats_sidecar``)
        # — absent any, that generation reads unpruned (never wrong)
        raw = _find_stats_sidecar(spark, table_path, g)
        stats = None
        if raw is not None:
            live = set(rels)
            stats = dict(raw)
            stats["files"] = {
                f: e
                for f, e in raw["files"].items()
                if ("/".join(f.split("/")[:-1]) in live)
                or (rels == [""] and "/" not in f)
            }
        out.append((g, _gen_base(table_path, g), sorted(rels), stats))
    return out, dv


def _range_keeps(ent: dict, ranges: dict) -> bool:
    """File-survives test for a conjunction of closed ranges.  Missing
    stats for a column → keep (never wrong).  All-NULL file for a
    range column → skip (range predicates are null-rejecting)."""
    for c, (lo, hi) in ranges.items():
        st = ent["cols"].get(c)
        if st is None:
            continue
        if st["nulls"] == ent["rows"]:
            return False
        mn, mx = st["min"], st["max"]
        if mn is None or mx is None:
            continue
        if lo is not None and mx < _bound_key(lo):
            return False
        if hi is not None and mn > _bound_key(hi):
            return False
    return True


def _read_selected(spark, selections, schema_src, dv_map=None, manifest=None):
    """selections: list of (gen_ref, base, [files]|None) — None =
    whole-dir read
    (no stats for that generation).  Empty overall selection returns
    an empty frame with the snapshot's schema.  ``dv_map``: the
    snapshot's deletion vectors, anti-joined per generation (stats
    stay valid upper bounds under DVs — deletes only remove rows, so
    pruning is conservative, never wrong).  ``manifest`` pins
    partition-column types to its stored schema."""
    dfs = []
    for g, base, files in selections:
        if files is None:
            raw = _read_parquet_pinned(spark, manifest or {}, base, None)
        elif files:
            raw = _read_parquet_pinned(
                spark, manifest or {}, base,
                [f"{base}/{f}" for f in sorted(files)],
            )
        else:
            continue
        dfs.append(
            _apply_renames(
                manifest or {}, g, _apply_dv(spark, raw, g, dv_map or {}, base=base)
            )
        )
    if not dfs:
        return schema_src.limit(0)
    return functools.reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def snapshot_read_where(
    spark: SparkSession,
    table_path: str,
    ranges: dict,
    at_gen: int | None = None,
    report: dict | None = None,
) -> DataFrame:
    """Stats-pruned snapshot read for a conjunction of closed ranges
    ``{col: (lo, hi)}`` (either bound may be None).  Only files whose
    commit-time [min,max] intersects every range are opened; the exact
    predicate is re-applied, so the result is IDENTICAL to
    ``read_snapshot_table(...).filter(...)`` — just with the file list
    decided from metadata before any task launches.  Pass ``report``
    to receive {files_total, files_read, files_skipped,
    unpruned_gens}."""
    sets, dv = _resolve_file_sets(spark, table_path, at_gen)
    selections = []
    total = read_n = unpruned = pruned_parts = 0
    for g, base, rels, stats in sets:
        live = [r for r in rels if _rel_survives_ranges(r, ranges)]
        pruned_parts += len(rels) - len(live)
        if stats is None:
            # no sidecar: read the SURVIVING partition dirs wholesale
            # (directory paths flow through the same selected-read as
            # file paths)
            if live == rels:
                selections.append((g, base, None))
            elif live:
                selections.append((g, base, list(live)))
            unpruned += 1
            continue
        live_set = set(live)
        files = {
            f: e
            for f, e in stats["files"].items()
            if ("/".join(f.split("/")[:-1]) in live_set)
            or (live == [""] and "/" not in f)
        }
        total += len(stats["files"])
        keep = [f for f, e in files.items() if _range_keeps(e, ranges)]
        read_n += len(keep)
        selections.append((g, base, keep))
    if report is not None:
        report.update(
            files_total=total,
            files_read=read_n,
            files_skipped=total - read_n,
            unpruned_gens=unpruned,
            pruned_partitions=pruned_parts,
        )
    mgen = at_gen if at_gen is not None else _current_gen(spark, table_path)
    df = _read_selected(
        spark, selections,
        read_snapshot_table(spark, table_path, at_gen=at_gen),
        dv_map=dv,
        manifest=_read_manifest(spark, table_path, mgen),
    )
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.filter(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(c) <= F.lit(hi))
    return df


def snapshot_read_point(
    spark: SparkSession,
    table_path: str,
    col: str,
    values: list,
    at_gen: int | None = None,
    report: dict | None = None,
) -> DataFrame:
    """Bloom-pruned point lookup: ``col IN (values)``.  Lookup hashes
    are computed by the SAME JVM xxhash64 the build used (a
    #values-row Spark job — types match the stored column exactly, so
    false negatives are impossible); a file is read iff some value
    lights all its k bloom bits, or min/max stats admit it when the
    sidecar predates bloom config.  Exact IN filter re-applied."""
    sets, dv = _resolve_file_sets(spark, table_path, at_gen)
    conf = _stats_conf(spark, table_path) or {}
    m = int(conf.get("bloom_bits", 4096))
    k = int(conf.get("bloom_hashes", 3))
    schema_src = read_snapshot_table(spark, table_path, at_gen=at_gen)
    vdf = spark.createDataFrame(
        [(v,) for v in values], schema=schema_src.select(col).schema
    )
    pos = vdf.select(
        F.array(
            *[F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m)) for i in range(k)]
        ).alias("p")
    ).collect()
    want = [tuple(int(x) for x in r["p"]) for r in pos]
    selections = []
    total = read_n = unpruned = 0
    for g, base, rels, stats in sets:
        if stats is None:
            selections.append((g, base, None))
            unpruned += 1
            continue
        bm = int(stats.get("bloom_bits", m))
        keep = []
        total += len(stats["files"])
        for f, e in stats["files"].items():
            bl = (e.get("bloom") or {}).get(col)
            if bl is None:
                # no bloom for this file: fall back to min/max, else keep
                st = e["cols"].get(col)
                if st is None or st["min"] is None:
                    keep.append(f)
                    continue
                if any(
                    st["min"] <= _bound_key(v) <= st["max"] for v in values
                ):
                    keep.append(f)
                continue
            bits = int(bl, 16)
            if bm != m:
                keep.append(f)  # config changed mid-table: never skip
                continue
            if any(all(bits >> p & 1 for p in ps) for ps in want):
                keep.append(f)
        read_n += len(keep)
        selections.append((g, base, keep))
    if report is not None:
        report.update(
            files_total=total,
            files_read=read_n,
            files_skipped=total - read_n,
            unpruned_gens=unpruned,
        )
    mgen = at_gen if at_gen is not None else _current_gen(spark, table_path)
    df = _read_selected(
        spark, selections, schema_src, dv_map=dv,
        manifest=_read_manifest(spark, table_path, mgen),
    )
    return df.filter(F.col(col).isin(values))


def snapshot_compact_partitions(
    spark: SparkSession,
    table_path: str,
    partition_cols: list[str],
    rels: list[str] | None = None,
    max_files_per_partition: int | None = None,
    zorder_cols: list[str] | None = None,
    zorder_bits: int = 16,
) -> dict:
    """PARTITION-SELECTIVE OPTIMIZE — the form compaction takes at
    100 TB, where `snapshot_optimize`'s whole-table rewrite is not an
    option: rewrite ONLY the named partitions (``rels``, relative
    ``p=v[/q=w]`` paths) — or, with ``max_files_per_partition``, only
    partitions whose live file count exceeds the bound (counted from
    the stats sidecars when present, a filesystem listing otherwise —
    metadata either way) — into one new generation; every other
    partition's manifest mapping is carried forward untouched.  This
    is Delta's ``OPTIMIZE table WHERE <partition predicate>``.

    ``zorder_cols`` clusters the rewritten subset on the Morton curve
    (bounds computed over the subset).  Commits through the same
    fenced protocol as every writer; the rewritten generation gets a
    stats sidecar when stats are enabled.  Returns
    {committed_gen, compacted, files_before} (gen unchanged if
    nothing qualified)."""
    _commit_recover(spark, table_path)
    _claim_recover(spark, table_path)
    cur = _current_gen(spark, table_path)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    manifest = _read_manifest(spark, table_path, cur)
    parts: dict[str, str] = manifest["partitions"]
    if rels is None and max_files_per_partition is None:
        raise ValueError("pass rels or max_files_per_partition")
    if rels is not None:
        missing = sorted(set(rels) - set(parts))
        if missing:
            raise ValueError(f"unknown partitions: {missing}")
        chosen = {r: None for r in rels}
    else:
        # live file count per partition rel: prefer the stats sidecars
        # (pure metadata), fall back to one listing per generation
        counts: dict[str, int] = {r: 0 for r in parts}
        by_gen: dict[str, list[str]] = {}
        for r, g in parts.items():
            by_gen.setdefault(g, []).append(r)
        for g, grels in by_gen.items():
            raw = _find_stats_sidecar(spark, table_path, g)
            live = set(grels)
            if raw is not None:
                for f in raw["files"]:
                    rel = "/".join(f.split("/")[:-1])
                    if rel in live or (grels == [""] and "/" not in f):
                        counts[rel if rel in live else ""] += 1
            else:
                for r in grels:
                    sub = _gen_base(table_path, g) + (f"/{r}" if r else "")
                    fs, p = _hfs(spark, sub)
                    if not fs.exists(p):
                        continue
                    counts[r] += sum(
                        1
                        for st in fs.listStatus(p)
                        if st.isFile()
                        and st.getPath().getName().endswith(".parquet")
                    )
        chosen = {
            r: c
            for r, c in counts.items()
            if c > max_files_per_partition
        }
    if not chosen:
        return {"committed_gen": cur, "compacted": [], "files_before": 0}

    subset = _read_partition_subset(
        spark, table_path, {r: parts[r] for r in chosen},
        dv_map=_dv_map(spark, table_path, manifest),
        manifest=manifest,
    )
    if zorder_cols:
        from gpt_rag_ingestion_spark.operators.layout import zorder_value

        stats = subset.agg(
            *[F.min(c).alias(f"min_{c}") for c in zorder_cols],
            *[F.max(c).alias(f"max_{c}") for c in zorder_cols],
        ).collect()[0]
        z = zorder_value(
            zorder_cols,
            {c: stats[f"min_{c}"] for c in zorder_cols},
            {c: stats[f"max_{c}"] for c in zorder_cols},
            zorder_bits,
        )
        subset = (
            subset.withColumn("__z", z)
            .repartitionByRange(
                max(spark.sparkContext.defaultParallelism, 1), "__z"
            )
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    else:
        # right-size: one file per partition dir unless the data says
        # otherwise (AQE coalesces the tiny shuffle partitions)
        subset = subset.repartition(*[F.col(c) for c in partition_cols])
    gen = cur + 1
    gname = _gen_name(gen)
    new_dir = _gen_dir(table_path, gname)
    subset.write.mode("overwrite").partitionBy(*partition_cols).parquet(
        new_dir
    )
    _maybe_write_stats(spark, table_path, gname, new_dir, schema=subset.schema)
    written = _list_partition_rels(spark, new_dir, len(partition_cols))
    partitions = {r: g for r, g in parts.items() if r not in chosen}
    partitions.update({r: gname for r in written})
    _commit(
        spark, table_path, gen, partitions, expected_cur=cur,
        extra=_carry_dv_ref(spark, table_path, manifest, partitions, gen),
        op="compact",
    )
    return {
        "committed_gen": gen,
        "compacted": sorted(chosen),
        "files_before": sum(c or 0 for c in chosen.values()),
    }


def snapshot_metadata_count(
    spark: SparkSession, table_path: str, at_gen: int | None = None
) -> int | None:
    """Exact COUNT(*) from commit metadata alone — no file opened, no
    job run (the Delta metadata-only count): sums the per-file row
    counts recorded in the stats sidecars over the manifest's live
    files.  Returns None when any live generation lacks a sidecar
    (count would need a scan; callers fall back to
    ``read_snapshot_table(...).count()``)."""
    sets, dv = _resolve_file_sets(spark, table_path, at_gen)
    total = 0
    for g, base, _rels, stats in sets:
        if stats is None:
            return None
        for f, e in stats["files"].items():
            total += e["rows"] - len(dv.get(f"{g}/{f}", []))
    return total


# ---------------------------------------------------------------------------
# CONSTRAINTS: named CHECK expressions enforced at write time
# ---------------------------------------------------------------------------

_CONSTRAINTS_CONF = "_constraints.json"


class SnapshotConstraintViolation(ValueError):
    """A write (or ADD CONSTRAINT over existing data) found rows
    violating a named CHECK expression.  The table is unchanged —
    validation happens BEFORE any data is written."""


def _constraints(spark, table_path: str) -> dict:
    p = f"{table_path}/{_CONSTRAINTS_CONF}"
    if not _fs_exists(spark, p):
        return {}
    return json.loads(_read_text(spark, p))["checks"]


def _validate_constraints(spark, table_path: str, df: DataFrame) -> None:
    """One filter-count per defined constraint over the INCREMENT
    (O(increment), the Delta write-time validation).  Counts every
    violating constraint before raising, so the error names them
    all."""
    checks = _constraints(spark, table_path)
    if not checks:
        return
    bad = {}
    for name, expr in sorted(checks.items()):
        # NULL check results do NOT satisfy a constraint (Delta rule)
        n = df.filter(~F.coalesce(F.expr(expr), F.lit(False))).count()
        if n:
            bad[name] = n
    if bad:
        raise SnapshotConstraintViolation(
            f"write rejected by CHECK constraint(s) {bad} at {table_path}"
        )


def snapshot_add_constraint(
    spark: SparkSession, table_path: str, name: str, expr: str
) -> None:
    """ADD CONSTRAINT <name> CHECK (<expr>): existing data is
    validated FIRST (one filter-count over the snapshot — the ALTER
    TABLE scan every format pays once); every later merge validates
    its increment before writing.  Idempotent for an identical
    (name, expr); a different expr under an existing name is an
    error (DROP first)."""
    existing = _constraints(spark, table_path)
    if name in existing and existing[name] != expr:
        raise ValueError(
            f"constraint {name!r} already defined as "
            f"{existing[name]!r}; drop it first"
        )
    if _current_gen(spark, table_path) is not None:
        snap = read_snapshot_table(spark, table_path)
        n = snap.filter(~F.coalesce(F.expr(expr), F.lit(False))).count()
        if n:
            raise SnapshotConstraintViolation(
                f"cannot add constraint {name!r}: {n} existing rows "
                f"violate CHECK ({expr})"
            )
    checks = dict(existing)
    checks[name] = expr
    _fs_mkdirs(spark, table_path)
    _write_text(
        spark,
        f"{table_path}/{_CONSTRAINTS_CONF}",
        json.dumps({"checks": checks}, sort_keys=True),
    )


def snapshot_drop_constraint(
    spark: SparkSession, table_path: str, name: str
) -> bool:
    """DROP CONSTRAINT; returns whether it existed."""
    checks = _constraints(spark, table_path)
    found = name in checks
    checks.pop(name, None)
    _write_text(
        spark,
        f"{table_path}/{_CONSTRAINTS_CONF}",
        json.dumps({"checks": checks}, sort_keys=True),
    )
    return found


def snapshot_update(
    spark: SparkSession,
    table_path: str,
    where: str,
    assignments: dict,
    key: str = "parent_id",
    partition_cols: list[str] | None = None,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    max_conflict_rebases: int = 0,
) -> int:
    """UPDATE ... SET <assignments> WHERE <where> — executed as a
    keyed merge of the transformed matching rows, so it inherits the
    whole commit contract for free: O(affected partitions) writes,
    fenced atomic commit, CHECK-constraint validation over exactly
    the updated rows, CDF visibility as update_pre/postimages, stats
    sidecars on the rewritten generation.  Updating a PARTITION
    column is legal (the merge's key semi-join removes the row from
    its old partition); updating ``key`` itself is rejected — that is
    an insert+delete, not an update.  Returns the committed
    generation (unchanged when nothing matches).

    ``txn_app_id``/``txn_version``: the same idempotent-writes ledger
    as every other write path — a retried orchestrator task
    re-delivering the same UPDATE is a no-op (gated inside the
    delegated merge).  An update matching ZERO rows commits nothing
    and stamps no ledger entry; its replay is naturally a no-op.

    One-pinned-read-per-attempt (r11 advisor): each attempt pins the
    base generation ONCE, derives the matched rows from a time-travel
    read at that generation, and hands the SAME generation to the
    delegated merge (``pinned_cur``) — a rival committing anywhere
    between the pin and the commit surfaces as
    ``SnapshotWriteConflict``, and ``max_conflict_rebases`` re-runs
    the WHOLE attempt (re-pin, re-match, re-merge) against the
    winner, like every other write path."""
    if key in assignments:
        raise ValueError(
            f"cannot assign the merge key {key!r}; delete+insert instead"
        )
    idc = _identity_conf(spark, table_path)
    if idc and idc["column"] in assignments:
        raise SnapshotIdentityViolation(
            f"{idc['column']!r} is GENERATED ALWAYS AS IDENTITY — "
            "UPDATE must not assign it"
        )

    def _once() -> int:
        _commit_recover(spark, table_path)
        _claim_recover(spark, table_path)
        cur = _current_gen(spark, table_path)
        if cur is None:
            raise FileNotFoundError(
                f"no committed snapshot at {table_path}"
            )
        matched = read_snapshot_table(
            spark, table_path, at_gen=cur
        ).filter(F.expr(where))
        upd = matched
        for c, e in sorted(assignments.items()):
            upd = upd.withColumn(c, F.expr(e))
        if idc:
            # the merge path mints/keeps identity itself (GENERATED
            # ALWAYS); updated rows are existing single-key rows, so
            # the keep-join reattaches their committed ids
            upd = upd.drop(idc["column"])
        if upd.isEmpty():
            return cur
        return _snapshot_merge_upsert_once(
            spark, table_path, upd, key=key,
            partition_cols=partition_cols,
            txn_app_id=txn_app_id, txn_version=txn_version,
            pinned_cur=cur,
        )

    return _retrying_merge(_once, max_conflict_rebases)


class SnapshotOverwritePredicateViolation(ValueError):
    """``snapshot_overwrite_where`` received replacement rows that do
    not satisfy the overwrite predicate.  Nothing was written."""


def _expr_mentions_column(where, name: str) -> bool:
    """Does the predicate (SQL string or Column) reference ``name``?
    Textual word-boundary check, case-insensitive (SQL identifier
    semantics), matching bare and backtick-quoted forms.  CONSERVATIVE
    by design: a string literal containing the name also matches —
    for the GENERATED-ALWAYS guard a rare false rejection (rename the
    literal or pre-filter) is the right trade against a
    nondeterministic n_bad gate."""
    text = where if isinstance(where, str) else str(where)
    return (
        re.search(
            rf"(?<![A-Za-z0-9_]){re.escape(name)}(?![A-Za-z0-9_])",
            text,
            re.IGNORECASE,
        )
        is not None
    )


def _snapshot_overwrite_where_once(
    spark: SparkSession,
    table_path: str,
    replacement: DataFrame,
    where,
    partition_cols: list[str] | None = None,
    max_conflict_rebases: int = 0,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """INSERT OVERWRITE ... WHERE — Delta's ``replaceWhere``: one
    atomic commit deletes every committed row matching ``where`` and
    lands ``replacement`` in its place (the backfill idiom: recompute
    a slice, swap it in, readers never see a hole).  Every replacement
    row must itself satisfy ``where`` (Delta's constraint — otherwise
    the operation isn't an overwrite of that region), checked before
    anything is written.

    Scale shape: only partitions that HOLD matching rows or RECEIVE
    replacement rows rewrite; rows in those partitions that do not
    match ``where`` are carried verbatim, and untouched partitions
    keep their manifest refs — a partition-aligned predicate makes
    this a pure partition swap, a row-level predicate costs one
    filtered rewrite of the affected partitions only."""
    _commit_recover(spark, table_path)
    _claim_recover(spark, table_path)
    # one pinned base generation per attempt (r10 advisor, medium;
    # see _snapshot_merge_upsert_once)
    cur = _current_gen(spark, table_path)
    # idempotent writes: a retried backfill (orchestrator re-delivery)
    # must not double-swap the slice
    skip_gen, txn_ledger, txn_gens = _txn_gate(
        spark, table_path, txn_app_id, txn_version, cur
    )
    if skip_gen is not None:
        return skip_gen

    def _xt(extra: dict | None) -> dict | None:
        if txn_ledger is None:
            return extra
        out = dict(extra or {})
        out["txn"] = txn_ledger
        out["txn_gen"] = txn_gens
        return out

    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    replacement = _apply_generated(spark, table_path, replacement)
    # GENERATED ALWAYS AS IDENTITY: replacement rows are inserts (the
    # matched region dies wholesale), so the engine mints their ids —
    # callers must not supply the column, and ``where`` must not
    # reference it (engine-assigned values cannot be promised to
    # satisfy a caller predicate — the n_bad violation gate below
    # would pass or fail nondeterministically depending on the minted
    # values; r10 advisor, low: now ENFORCED, not just documented).
    # Minting happens BEFORE the predicate/column-set checks so both
    # see the full schema.
    _ow_idc = _identity_conf(spark, table_path)
    if _ow_idc and _expr_mentions_column(where, _ow_idc["column"]):
        raise SnapshotIdentityViolation(
            f"the overwrite predicate references the GENERATED ALWAYS "
            f"AS IDENTITY column {_ow_idc['column']!r} — engine-"
            "assigned values cannot be promised to satisfy a caller "
            "predicate; overwrite by a data/partition predicate "
            "instead"
        )
    _ow_existing = read_snapshot_table(spark, table_path, at_gen=cur)
    id_refuse = (
        "identity high-water derived from the base snapshot"
        if _ow_idc is not None
        else (
            "txn ledger derived from the base snapshot"
            if txn_ledger is not None
            else None
        )
    )
    replacement = _mint_identity(spark, table_path, replacement, _ow_existing)
    where_col = F.expr(where) if isinstance(where, str) else where
    n_bad = replacement.filter(
        ~F.coalesce(where_col, F.lit(False))
    ).count()
    if n_bad:
        raise SnapshotOverwritePredicateViolation(
            f"{n_bad} replacement rows do not satisfy the overwrite "
            f"predicate ({where if isinstance(where, str) else 'Column'})"
        )
    _validate_constraints(spark, table_path, replacement)
    existing = _ow_existing
    if sorted(existing.columns) != sorted(replacement.columns):
        raise SnapshotSchemaMismatch(
            "snapshot_overwrite_where needs identical column sets; "
            f"table has {sorted(existing.columns)}, replacement "
            f"{sorted(replacement.columns)}"
        )
    manifest = _read_manifest(spark, table_path, cur)
    gen = cur + 1
    gname = _gen_name(gen)
    new_dir = _gen_dir(table_path, gname)
    pred = F.coalesce(where_col, F.lit(False))

    if not partition_cols:
        out = existing.filter(~pred).unionByName(replacement)
        out.write.mode("overwrite").parquet(new_dir)
        _maybe_write_stats(spark, table_path, gname, new_dir, schema=out.schema)
        return _commit_rebasing(
            spark, table_path, gen, {"": gname}, expected_cur=cur,
            extra=_xt(_with_schema(
                _carry_dv_ref(
                    spark, table_path, manifest, {"": gname}, gen
                ),
                out, prev=manifest,
            )),
            op="overwrite_where", max_rebases=max_conflict_rebases,
            refuse_rebase=id_refuse,
        )

    affected = [
        tuple(r[c] for c in partition_cols)
        for r in existing.filter(pred).select(*partition_cols)
        .unionByName(replacement.select(*partition_cols))
        .distinct().collect()
    ]
    if not affected:
        return cur

    def _match(values):
        terms = [
            F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
            for c, v in zip(partition_cols, values)
        ]
        return functools.reduce(lambda a, b: a & b, terms)

    part_pred = functools.reduce(
        lambda a, b: a | b, [_match(v) for v in affected]
    )
    out = existing.filter(part_pred & ~pred).unionByName(replacement)
    out.write.mode(
        "overwrite"
    ).partitionBy(*partition_cols).parquet(new_dir)
    _maybe_write_stats(spark, table_path, gname, new_dir, schema=out.schema)
    affected_rels = {
        _partition_rel_path(partition_cols, v) for v in affected
    }
    written = _list_partition_rels(spark, new_dir, len(partition_cols))
    partitions = {
        r: g for r, g in manifest["partitions"].items()
        if r not in affected_rels
    }
    partitions.update({r: gname for r in written})
    return _commit_rebasing(
        spark, table_path, gen, partitions, expected_cur=cur,
        extra=_xt(_with_schema(
            _carry_dv_ref(spark, table_path, manifest, partitions, gen),
            out, partition_cols, prev=manifest,
        )),
        op="overwrite_where", max_rebases=max_conflict_rebases,
        refuse_rebase=id_refuse,
    )


def snapshot_overwrite_where(
    spark: SparkSession,
    table_path: str,
    replacement: DataFrame,
    where,
    partition_cols: list[str] | None = None,
    max_conflict_rebases: int = 0,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """See ``_snapshot_overwrite_where_once``; ``where`` is a SQL
    predicate string or a Column.  Overlap/claim conflicts retry
    against the winner's snapshot (``_retrying_merge``).
    ``txn_app_id``/``txn_version``: the same idempotent-writes ledger
    as the merge/delete paths (a retried backfill is a re-delivery)."""
    return _retrying_merge(
        lambda: _snapshot_overwrite_where_once(
            spark, table_path, replacement, where,
            partition_cols=partition_cols,
            max_conflict_rebases=max_conflict_rebases,
            txn_app_id=txn_app_id,
            txn_version=txn_version,
        ),
        max_conflict_rebases,
    )


def snapshot_insert_overwrite_partitions(
    spark: SparkSession,
    table_path: str,
    replacement: DataFrame,
    partition_cols: list[str],
    max_conflict_rebases: int = 0,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """Spark's DYNAMIC PARTITION OVERWRITE
    (``partitionOverwriteMode=dynamic``) on the snapshot sink: every
    partition PRESENT in ``replacement`` is replaced wholesale in one
    atomic commit; partitions absent from it are untouched.  Sugar
    over ``snapshot_overwrite_where`` with the predicate derived from
    the replacement's own distinct partition tuples (typed literals,
    NULL-safe), so the replacement trivially satisfies it — the
    re-partition backfill idiom without hand-writing the predicate."""
    vals = [
        tuple(r[c] for c in partition_cols)
        for r in replacement.select(*partition_cols).distinct().collect()
    ]
    cur = _current_gen(spark, table_path)
    if not vals:
        if cur is None:
            raise FileNotFoundError(
                f"no committed snapshot at {table_path}"
            )
        return cur

    def _match(values):
        terms = [
            F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
            for c, v in zip(partition_cols, values)
        ]
        return functools.reduce(lambda a, b: a & b, terms)

    pred = functools.reduce(lambda a, b: a | b, [_match(v) for v in vals])
    return snapshot_overwrite_where(
        spark, table_path, replacement, pred,
        partition_cols=partition_cols,
        max_conflict_rebases=max_conflict_rebases,
        txn_app_id=txn_app_id,
        txn_version=txn_version,
    )


def snapshot_history(spark: SparkSession, table_path: str) -> list[dict]:
    """DESCRIBE HISTORY: one dict per commit whose manifest still
    exists (vacuum is the retention boundary), oldest first —
    {gen, op, committed_at_ms, n_partitions, n_generations, has_dv,
    current, txn}.  ``committed_at_ms`` is the durable commit clock
    stamped in the manifest (Delta HISTORY's timestamp column; None
    for pre-r12 manifests).  ``txn`` is the idempotent-writer ledger
    as of that commit ({app: last_version}, Delta's
    operationParameters-adjacent surface).  Driver-side metadata
    only; older manifests may predate the op tag and report
    op=None."""
    cur = _current_gen(spark, table_path)
    fs, mdir = _hfs(spark, f"{table_path}/_manifests")
    if not fs.exists(mdir):
        return []
    gens = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.endswith(".json"):
            try:
                g = int(name[:-5])
            except ValueError:
                continue
            if cur is None or g <= cur:
                gens.append(g)
    out = []
    for g in sorted(gens):
        m = _read_manifest(spark, table_path, g)
        out.append(
            {
                "gen": g,
                "op": m.get("op"),
                "committed_at_ms": m.get("committed_at_ms"),
                "n_partitions": len(m["partitions"]),
                "n_generations": len(set(m["partitions"].values())),
                "has_dv": bool(m.get("dv")),
                "current": g == cur,
                "txn": m.get("txn") or {},
                # retention observability: the generation each app's
                # entry was last updated at (ages against the
                # snapshot_set_ledger_retention horizon)
                "txn_gen": m.get("txn_gen") or {},
            }
        )
    return out


def snapshot_restore(
    spark: SparkSession, table_path: str, to_gen: int | None = None,
    to_ts_ms: int | None = None,
) -> int:
    """RESTORE TABLE TO VERSION / TIMESTAMP (Delta RESTORE): commit a
    NEW generation whose manifest equals the target snapshot's — the
    restore is itself a commit (history moves forward, never
    rewinds), no data is copied (the old generation directories are
    re-referenced), and the target's deletion vectors are restored
    with it.  Requires the target manifest to still exist (vacuum is
    the retention boundary).  After a restore, run vacuum only with a
    retention window that keeps the re-referenced generations —
    handled automatically: vacuum keeps everything the CURRENT
    manifest references.

    ``to_ts_ms`` is the `RESTORE ... TO TIMESTAMP AS OF` half: the
    target is the newest generation committed at-or-before the
    timestamp (the same resolution rule as time-travel reads,
    ``snapshot_gen_at_timestamp``).  Pass exactly one of
    ``to_gen``/``to_ts_ms``."""
    if (to_gen is None) == (to_ts_ms is None):
        raise ValueError("pass exactly one of to_gen or to_ts_ms")
    if to_ts_ms is not None:
        to_gen = snapshot_gen_at_timestamp(spark, table_path, to_ts_ms)
    _commit_recover(spark, table_path)
    _claim_recover(spark, table_path)
    cur = _current_gen(spark, table_path)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    if not _fs_exists(spark, _manifest_path(table_path, to_gen)):
        raise FileNotFoundError(
            f"no manifest for generation {to_gen} at {table_path} "
            "(never committed, or removed by snapshot_vacuum)"
        )
    if to_gen == cur:
        return cur
    target = _read_manifest(spark, table_path, to_gen)
    gen = cur + 1
    extra = {"restored_from": to_gen}
    if target.get("dv"):
        extra["dv"] = target["dv"]
    # the restored snapshot's schema is the TARGET's, not the current
    # pointer's (the default carry would take the latter); same for
    # the rename history — stating it even when empty blocks the carry
    if target.get("schema"):
        extra["schema"] = target["schema"]
        if target.get("partition_cols"):
            extra["partition_cols"] = target["partition_cols"]
    extra["renames"] = target.get("renames") or []
    _commit(
        spark, table_path, gen, dict(target["partitions"]),
        expected_cur=cur, extra=extra, op="restore",
    )
    return gen


def snapshot_rename_column(
    spark: SparkSession, table_path: str, old: str, new: str
) -> int:
    """ALTER TABLE ... RENAME COLUMN — Delta's column mapping (name
    mode): a METADATA-ONLY commit, zero data files rewritten.  The
    manifest records the rename together with the generation dirs
    live at commit time; readers rename those dirs' columns on the
    fly (``_apply_renames``), while every later write carries the new
    name physically.  OPTIMIZE/compaction naturally LOCALIZES the
    rename (rewritten dirs match no entry), so the mapping debt
    self-amortizes.

    Guardrails (each a documented Delta-parity restriction):
    - PARTITION columns cannot rename (their directory names are the
      manifest's partition keys; rewrite via overwrite instead);
    - columns referenced by CHECK constraints, generated columns, the
      identity column, or the stats/bloom config must have those
      dropped/re-declared first (never silently rewrite stored
      expressions);
    - requires a stored schema (any table committed by this module
      has one).
    """
    import re as _re

    cur = _current_gen(spark, table_path)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    manifest = _read_manifest(spark, table_path, cur)
    schema_json = manifest.get("schema")
    if not schema_json:
        raise ValueError(
            "rename requires a manifest-stored schema (legacy table: "
            "run one merge first)"
        )
    names = [f["name"] for f in schema_json["fields"]]
    if old not in names:
        raise ValueError(f"no column {old!r} (have {sorted(names)})")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    if old in (manifest.get("partition_cols") or []):
        raise ValueError(
            f"{old!r} is a partition column — partition-column renames "
            "need a rewrite (snapshot_overwrite_where), not metadata"
        )
    word = _re.compile(rf"\b{_re.escape(old)}\b")
    for label, exprs in (
        ("CHECK constraint", list(_constraints(spark, table_path).values())),
        ("generated column", list(
            _generated_columns(spark, table_path).values()
        ) + list(_generated_columns(spark, table_path).keys())),
    ):
        if any(word.search(e) for e in exprs):
            raise ValueError(
                f"{old!r} is referenced by a {label}; drop/re-declare "
                "it around the rename"
            )
    idc = _identity_conf(spark, table_path)
    if idc and idc["column"] == old:
        raise ValueError(
            f"{old!r} is the identity column; re-declare identity "
            "around the rename"
        )
    sconf = _stats_conf(spark, table_path) or {}
    if old in (sconf.get("cols") or []) + (sconf.get("bloom_cols") or []):
        raise ValueError(
            f"{old!r} is in the stats/bloom config; re-declare stats "
            "around the rename"
        )
    new_schema = json.loads(json.dumps(schema_json))
    for f in new_schema["fields"]:
        if f["name"] == old:
            f["name"] = new
    entry = {
        "from": old,
        "to": new,
        "gen": cur + 1,
        "dirs": sorted(
            {
                g.rstrip("/").rsplit("/", 1)[-1]
                for g in manifest["partitions"].values()
            }
        ),
    }
    extra = {
        "schema": new_schema,
        "renames": (manifest.get("renames") or []) + [entry],
    }
    if manifest.get("partition_cols"):
        extra["partition_cols"] = manifest["partition_cols"]
    if manifest.get("dv"):
        extra["dv"] = manifest["dv"]
    gen = cur + 1
    _commit(
        spark, table_path, gen, dict(manifest["partitions"]),
        expected_cur=cur, extra=extra, op="rename_column",
    )
    return gen


def snapshot_drop_column(
    spark: SparkSession, table_path: str, col: str
) -> int:
    """ALTER TABLE ... DROP COLUMN — the same column-mapping
    machinery as ``snapshot_rename_column`` with ``to=None``: a
    METADATA-ONLY commit; files in generation dirs live at drop time
    keep the bytes but readers drop the column on the fly, later
    writes omit it physically, and OPTIMIZE localizes (physically
    sheds) it.  A later schema-evolution merge may re-introduce a
    FRESH column under the same name without resurrecting old values
    (dir-name matching).  Same guardrails as rename."""
    import re as _re

    cur = _current_gen(spark, table_path)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    manifest = _read_manifest(spark, table_path, cur)
    schema_json = manifest.get("schema")
    if not schema_json:
        raise ValueError(
            "drop requires a manifest-stored schema (legacy table: "
            "run one merge first)"
        )
    names = [f["name"] for f in schema_json["fields"]]
    if col not in names:
        raise ValueError(f"no column {col!r} (have {sorted(names)})")
    if len(names) == 1:
        raise ValueError("cannot drop the table's only column")
    if col in (manifest.get("partition_cols") or []):
        raise ValueError(
            f"{col!r} is a partition column — partition-column drops "
            "need a rewrite (snapshot_overwrite_where), not metadata"
        )
    word = _re.compile(rf"\b{_re.escape(col)}\b")
    for label, exprs in (
        ("CHECK constraint", list(_constraints(spark, table_path).values())),
        ("generated column", list(
            _generated_columns(spark, table_path).values()
        ) + list(_generated_columns(spark, table_path).keys())),
    ):
        if any(word.search(e) for e in exprs):
            raise ValueError(
                f"{col!r} is referenced by a {label}; drop/re-declare "
                "it around the drop"
            )
    idc = _identity_conf(spark, table_path)
    if idc and idc["column"] == col:
        raise ValueError(
            f"{col!r} is the identity column; re-declare identity "
            "around the drop"
        )
    sconf = _stats_conf(spark, table_path) or {}
    if col in (sconf.get("cols") or []) + (sconf.get("bloom_cols") or []):
        raise ValueError(
            f"{col!r} is in the stats/bloom config; re-declare stats "
            "around the drop"
        )
    new_schema = json.loads(json.dumps(schema_json))
    new_schema["fields"] = [
        f for f in new_schema["fields"] if f["name"] != col
    ]
    entry = {
        "from": col,
        "to": None,
        "gen": cur + 1,
        "dirs": sorted(
            {
                g.rstrip("/").rsplit("/", 1)[-1]
                for g in manifest["partitions"].values()
            }
        ),
    }
    extra = {
        "schema": new_schema,
        "renames": (manifest.get("renames") or []) + [entry],
    }
    if manifest.get("partition_cols"):
        extra["partition_cols"] = manifest["partition_cols"]
    if manifest.get("dv"):
        extra["dv"] = manifest["dv"]
    gen = cur + 1
    _commit(
        spark, table_path, gen, dict(manifest["partitions"]),
        expected_cur=cur, extra=extra, op="drop_column",
    )
    return gen


def snapshot_clone(
    spark: SparkSession, source_path: str, clone_path: str
) -> int:
    """SHALLOW CLONE (Delta `CREATE TABLE ... SHALLOW CLONE src`):
    create a NEW table whose first manifest references the SOURCE's
    current generation directories BY ABSOLUTE PATH — zero data
    copied, metadata-only cost, and the clone is immediately a
    first-class table: merges, deletes, OPTIMIZE, time travel and CDF
    all work, writing their own LOCAL generations on top of the
    shared ones.  Divergence is free in both directions because
    generations are immutable — the clone never mutates the source
    and vice versa.  The training-data use case is experiment
    branching: fork the 100 TB corpus table, apply a candidate
    filter/dedup policy on the branch, compare, throw away.

    VACUUM SAFETY: cloning registers a breadcrumb at every source
    table the new manifest references (``_clones/<id>.json``), and
    ``snapshot_vacuum`` refuses to delete generations a registered
    live clone still references — so branching a corpus and waiting
    out the source's retention is SAFE, not an operational footgun.
    OPTIMIZE on the clone localizes every partition and releases the
    protection (the breadcrumb self-prunes at the source's next
    vacuum).

    Contract limits (Delta's own shallow-clone caveats):
    - still-shared generations BORROW the source's stats sidecars for
      pruned reads (``_find_stats_sidecar``, r12 — sidecars are
      written before commit and immutable after, so borrowing one is
      as safe as borrowing the data files it describes); if the
      source never collected stats, those reads stay unpruned until
      a rewrite localizes them.
    - a source with ACTIVE deletion vectors must be compacted first
      (the DV map is keyed by source-local file paths); refused
      explicitly below.
    - the idempotent-writes ledger (txn_app_id/txn_version) is NOT
      copied — exactly Delta's rule that clones drop application
      transaction identifiers: the clone is a NEW table, so a stream
      re-pointed at it must use a fresh checkpoint (its batches
      re-apply from scratch rather than being silently skipped by a
      ledger that never saw them land HERE).
    """
    cur = _current_gen(spark, source_path)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {source_path}")
    if _current_gen(spark, clone_path) is not None:
        raise FileExistsError(f"clone target already exists: {clone_path}")
    manifest = _read_manifest(spark, source_path, cur)
    if manifest.get("dv"):
        raise ValueError(
            f"source {source_path} has active deletion vectors; run "
            "snapshot_optimize/compact on it before cloning"
        )
    src_abs = source_path.rstrip("/")
    partitions = {
        rel: _gen_base(src_abs, g)
        for rel, g in manifest["partitions"].items()
    }
    _fs_mkdirs(spark, clone_path)
    # clones inherit TABLE METADATA (Delta clones carry table
    # properties): stats config so clone-local generations write
    # skipping sidecars, CHECK constraints, generated columns
    # the ledger RETENTION POLICY is table metadata and travels with
    # the clone even though the ledger itself does not (Delta clones
    # carry table properties; setTransaction entries are dropped)
    for conf in (
        _STATS_CONF, _CONSTRAINTS_CONF, _GENERATED_CONF, _IDENTITY_CONF,
        _LEDGER_RETENTION_CONF,
    ):
        sp = f"{src_abs}/{conf}"
        if _fs_exists(spark, sp):
            _write_text(spark, f"{clone_path}/{conf}", _read_text(spark, sp))
    # register BEFORE the clone's commit at EVERY table whose
    # generations it will reference — the direct source, and (for a
    # clone-of-clone) any deeper original the source itself still
    # shared.  Order matters: an aborted clone leaves a breadcrumb
    # that self-prunes at the source's next vacuum, whereas a
    # committed-but-unregistered clone would be a vacuum race window.
    for ref_root in {g.rsplit("/", 1)[0] for g in partitions.values()}:
        # only SNAPSHOT TABLES vacuum — a converted-from raw parquet
        # ref resolves to a plain directory whose "root" is the
        # caller's space; nothing ever GCs there, so no breadcrumb
        # (and no stray _clones/ dir dropped outside the engine)
        if _fs_exists(spark, f"{ref_root}/_manifests"):
            _register_clone(spark, ref_root, clone_path)
    clone_extra = {"cloned_from": src_abs, "cloned_gen": cur}
    # a fresh table has no predecessor manifest to carry from —
    # inherit the source snapshot's stored schema explicitly
    if manifest.get("schema"):
        clone_extra["schema"] = manifest["schema"]
        if manifest.get("partition_cols"):
            clone_extra["partition_cols"] = manifest["partition_cols"]
    # rename history travels with the shared generation dirs it
    # describes (dir-name matching is path-independent, so entries
    # keep working against the clone's absolute source refs)
    if manifest.get("renames"):
        clone_extra["renames"] = manifest["renames"]
    _commit(
        spark, clone_path, 1, partitions, expected_cur=None,
        extra=clone_extra, op="clone",
    )
    return 1


def snapshot_convert_from_parquet(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    partition_cols: list[str] | None = None,
    collect_stats: bool = False,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """CONVERT an existing plain-parquet directory into a snapshot
    table WITHOUT copying or rewriting a byte (Delta's `CONVERT TO
    DELTA` — the adoption path for a data lake that already exists):
    generation 1's manifest references the source directory by
    ABSOLUTE path, the same external-reference mechanism shallow
    clones use.  At 100 TB this is the difference between adopting a
    corpus in one metadata commit and re-writing it through a sink.

    After conversion the table is first-class: merges, deletes,
    OPTIMIZE, constraints, identity, CDF and time travel all work,
    writing LOCAL generations alongside the external reference;
    OPTIMIZE/compaction naturally LOCALIZES the data (rewritten
    partitions stop referencing the source), after which the source
    directory is no longer referenced at all.

    Contract (each bound is Delta-parity or stricter):
    - ``table_path`` must be a NEW location, distinct from
      ``source_dir``: generation refs are directory-granular here
      (Delta's log tracks files, so it can convert in place; a local
      generation written inside the source dir would double-read).
      The metadata lives next door; the data does not move.
    - the source directory is OWNED BY THE CALLER: vacuum only ever
      deletes ``gen-*`` directories under the table root, so the
      engine never touches the converted-from files — deleting the
      source while the manifest still references it breaks the table
      exactly like deleting a clone's source (OPTIMIZE first to
      localize, as with clones).
    - schema/partition-type INFERENCE happens exactly once, at
      convert time, and is pinned into the manifest (the same stored
      schema every later commit carries) — a string partition value
      that looks numeric is adopted with the inferred type; normalize
      the directory first if that inference is wrong for the data.
    - ``collect_stats=True`` (r11 verdict #2) closes the
      unpruned-adoption tax: ONE read-only, column-pruned scan of the
      source builds the min/max(/bloom) sidecar for the external
      generation — data still unmoved — so ``snapshot_read_where`` /
      ``snapshot_read_point`` file-skip over the adopted corpus from
      day one instead of full-scanning until OPTIMIZE localizes it.
      ``stats_cols`` defaults to every supported-type data column
      (partition columns prune via the directory layout already);
      the sidecar lives in OUR ``_stats/`` (``ext-<digest>.json``) —
      the engine still never writes inside the caller's directory.
      Without it, reads of the external generation are unpruned (same
      as clone-shared generations) until a rewrite localizes them.
    """
    src_abs = source_dir.rstrip("/")
    tbl_abs = table_path.rstrip("/")
    if src_abs == tbl_abs:
        raise ValueError(
            "snapshot_convert_from_parquet needs a table_path distinct "
            "from source_dir (generation refs are directory-granular; "
            "local generations written into the source dir would "
            "double-read) — point table_path at a new location, the "
            "data is referenced in place either way"
        )
    # writer-start recovery, like every other write path: a convert
    # that died between its claim and the pointer swap must not block
    # the retry forever (claims age out by lease)
    _commit_recover(spark, table_path)
    _claim_recover(spark, table_path)
    if _current_gen(spark, table_path) is not None:
        raise FileExistsError(f"table already exists: {table_path}")
    if not _fs_exists(spark, src_abs):
        raise FileNotFoundError(f"no parquet directory at {src_abs}")
    # the ONE inference read: its schema (including partition-column
    # types) is stored in the manifest and pins every later read
    df = spark.read.parquet(src_abs)
    if partition_cols:
        missing = [c for c in partition_cols if c not in df.columns]
        if missing:
            raise ValueError(
                f"partition columns not in the source data: {missing}"
            )
        rels = _list_partition_rels(spark, src_abs, len(partition_cols))
        if not rels:
            raise ValueError(
                f"{src_abs} has no "
                f"{'/'.join(c + '=*' for c in partition_cols)} "
                "partition directories"
            )
        # the directory LAYOUT must name the columns in the declared
        # order (r11 advisor): adopting an a=/b= layout with
        # partition_cols=['b','a'] would record rel keys no later
        # write ever matches — merges would carry the stale source
        # rels alongside new ones and duplicate rows instead of
        # replacing partitions.
        for r in rels:
            segs = r.split("/")
            for i, c in enumerate(partition_cols):
                if not segs[i].startswith(f"{c}="):
                    raise ValueError(
                        f"partition_cols {partition_cols} do not match "
                        f"the directory layout at {src_abs}: segment "
                        f"{i} of {r!r} is not {c}=... — pass the "
                        "columns in the layout's own order"
                    )
        partitions = {r: src_abs for r in rels}
    else:
        partitions = {"": src_abs}
    _fs_mkdirs(spark, table_path)
    if collect_stats:
        cols = stats_cols
        if cols is None:
            cols = [
                f.name
                for f in df.schema.fields
                if f.dataType.simpleString() in _STATS_TYPES
                and f.name not in (partition_cols or [])
            ]
        snapshot_enable_stats(spark, table_path, cols, bloom_cols)
        # the one read-only stats scan: gname IS the external abs
        # path, so the sidecar lands at _stats/ext-<digest>.json and
        # rel keys are relative to the source dir — exactly what
        # _find_stats_sidecar/_resolve_file_sets read back
        _maybe_write_stats(
            spark, table_path, src_abs, src_abs, schema=df.schema
        )
    extra = _with_schema(
        {"converted_from": src_abs}, df, partition_cols
    )
    _commit(
        spark, table_path, 1, partitions, expected_cur=None,
        extra=extra, op="convert",
    )
    return 1


def snapshot_table_detail(spark: SparkSession, table_path: str) -> dict:
    """DESCRIBE DETAIL (the admin/ops metadata card, Delta's
    `DESCRIBE DETAIL` analog): current generation, referenced
    generation count, live file count and byte size, partition list,
    DV row count, stats/constraints/generated-column config presence,
    and the current manifest's op tag — ALL from metadata reads (the
    manifest, sidecars, and a file listing of referenced dirs); no
    Spark job, no data scan."""
    cur = _current_gen(spark, table_path)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    manifest = _read_manifest(spark, table_path, cur)
    parts = manifest["partitions"]
    gens = sorted(set(parts.values()))
    n_files = 0
    n_bytes = 0
    for g in gens:
        base = _gen_base(table_path, g)
        fs, p = _hfs(spark, base)
        if not fs.exists(p):
            continue
        it = fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().endswith(".parquet"):
                n_files += 1
                n_bytes += int(st.getLen())
    dv = _dv_map(spark, table_path, manifest)
    schema, pcols = _manifest_schema(manifest)
    return {
        "path": table_path,
        "generation": cur,
        # the durable commit clock of the CURRENT commit (Delta
        # DESCRIBE DETAIL's lastModified analog; None pre-r12)
        "committed_at_ms": manifest.get("committed_at_ms"),
        "converted_from": manifest.get("converted_from"),
        # DESCRIBE DETAIL carries the logical schema (Delta's card has
        # format + columns): "name:type" per column, in schema order;
        # None for manifests written before schema tracking (r9)
        "schema": (
            [f"{f.name}:{f.dataType.simpleString()}" for f in schema.fields]
            if schema is not None else None
        ),
        "partition_columns": pcols,
        "num_referenced_generations": len(gens),
        "num_files": n_files,
        "size_bytes": n_bytes,
        "partitions": sorted(parts.keys()),
        "dv_rows": sum(len(v) for v in dv.values()),
        "op": manifest.get("op"),
        "stats_enabled": _stats_conf(spark, table_path) is not None,
        "has_constraints": _fs_exists(
            spark, f"{table_path}/{_CONSTRAINTS_CONF}"
        ),
        "has_generated_columns": _fs_exists(
            spark, f"{table_path}/{_GENERATED_CONF}"
        ),
        "cloned_from": manifest.get("cloned_from"),
        "n_registered_clones": _count_clone_registrations(
            spark, table_path
        ),
        "identity_column": (
            (_identity_conf(spark, table_path) or {}).get("column")
        ),
        # LIVE column-mapping debt: rename/drop entries still acting on
        # at least one referenced generation dir.  History is
        # append-only (a diff spanning old snapshots may still need an
        # entry), but OPTIMIZE rewrites the dirs and the count here
        # drops to zero — the self-amortization made measurable.
        "n_column_mapping_entries": sum(
            1
            for r in (manifest.get("renames") or [])
            if any(
                d in {
                    g.rstrip("/").rsplit("/", 1)[-1]
                    for g in parts.values()
                }
                for d in r["dirs"]
            )
        ),
    }


def _count_clone_registrations(spark, table_path: str) -> int:
    fs, cdir = _hfs(spark, f"{table_path}/{_CLONES_DIR}")
    if not fs.exists(cdir):
        return 0
    return sum(
        1
        for st in fs.listStatus(cdir)
        if st.getPath().getName().endswith(".json")
    )


def snapshot_consume_changes(
    spark: SparkSession,
    table_path: str,
    cursor_path: str,
    key: str = "parent_id",
    include_preimages: bool = False,
) -> dict:
    """Cursor-based INCREMENTAL CONSUMPTION of the change feed — the
    loop every downstream incremental job runs (Delta's streaming CDF
    reader, batch form):

        state = snapshot_consume_changes(spark, tbl, cursor)
        ...apply state["changes"]...
        state["ack"]()          # durably advance the cursor

    Semantics: ``changes`` covers (last-acked gen, current gen]; the
    FIRST call (no cursor yet) returns the whole current snapshot as
    inserts — the bootstrap contract.  ``ack`` is called AFTER the
    caller has applied the changes, so delivery is at-least-once: a
    crash before ack re-delivers the same interval (downstream
    application must be idempotent or transactional, as with every
    change feed).  ``changes`` is None when the table hasn't moved.
    Raises FileNotFoundError when vacuum removed the cursor's
    manifest — the consumer fell behind the retention window and must
    re-bootstrap (delete the cursor)."""
    cur = _current_gen(spark, table_path)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    acked = None
    if _fs_exists(spark, cursor_path):
        acked = int(_read_text(spark, cursor_path).strip())

    def ack(to_gen=cur):
        tmp = f"{cursor_path}__tmp"
        _write_text(spark, tmp, str(to_gen))
        _fs_delete(spark, cursor_path)
        _fs_rename(spark, tmp, cursor_path)

    if acked is not None and acked == cur:
        return {"changes": None, "from_gen": acked, "to_gen": cur,
                "ack": ack}
    if acked is None:
        snap = read_snapshot_table(spark, table_path)
        boot = snap.withColumn("_change_type", F.lit("insert")).select(
            key, "_change_type",
            *[c for c in snap.columns if c != key],
        )
        return {"changes": boot, "from_gen": None, "to_gen": cur,
                "ack": ack}
    if not _fs_exists(spark, _manifest_path(table_path, acked)):
        raise FileNotFoundError(
            f"cursor at generation {acked} fell behind the vacuum "
            f"retention window of {table_path}; delete {cursor_path} "
            "to re-bootstrap"
        )
    ch = snapshot_changes(
        spark, table_path, acked, cur, key=key,
        include_preimages=include_preimages,
    )
    return {"changes": ch, "from_gen": acked, "to_gen": cur, "ack": ack}


# ---------------------------------------------------------------------------
# GENERATED COLUMNS
# ---------------------------------------------------------------------------

_GENERATED_CONF = "_generated_columns.json"


def snapshot_set_generated_columns(
    spark: SparkSession, table_path: str, columns: dict
) -> None:
    """Delta GENERATED ALWAYS AS: declare ``{col: sql_expr}`` once;
    every merge computes a declared column from its expression when
    the increment does not carry it (and REJECTS an increment that
    carries a conflicting value — the Delta rule: supplied values must
    match the generation expression).  The standard use is a derived
    partition column (e.g. event date from a timestamp) that callers
    never have to remember to add."""
    _fs_mkdirs(spark, table_path)
    _write_text(
        spark,
        f"{table_path}/{_GENERATED_CONF}",
        json.dumps({"columns": dict(columns)}, sort_keys=True),
    )


def _generated_columns(spark, table_path: str) -> dict:
    p = f"{table_path}/{_GENERATED_CONF}"
    if not _fs_exists(spark, p):
        return {}
    return json.loads(_read_text(spark, p))["columns"]


class SnapshotGeneratedColumnViolation(ValueError):
    """An increment supplied values for a generated column that differ
    from its generation expression.  Nothing was written."""


def _apply_generated(spark, table_path: str, incoming: DataFrame) -> DataFrame:
    gen_cols = _generated_columns(spark, table_path)
    for c, expr in sorted(gen_cols.items()):
        if c in incoming.columns:
            n = incoming.filter(
                ~F.col(c).eqNullSafe(F.expr(expr))
            ).count()
            if n:
                raise SnapshotGeneratedColumnViolation(
                    f"{n} incoming rows supply {c!r} values that differ "
                    f"from GENERATED ALWAYS AS ({expr})"
                )
        else:
            incoming = incoming.withColumn(c, F.expr(expr))
    return incoming


_IDENTITY_CONF = "_identity_config.json"


def snapshot_set_identity(
    spark: SparkSession,
    table_path: str,
    column: str,
    start: int = 1,
    step: int = 1,
) -> None:
    """Delta GENERATED ALWAYS AS IDENTITY: declare a surrogate-key
    column the ENGINE assigns on insert.  Increments must NOT carry
    the column (the GENERATED ALWAYS rule, enforced on EVERY write
    path: merge_upsert, merge_when, overwrite_where,
    insert_overwrite_partitions, and update — which also refuses
    assignments to it); ``snapshot_merge_upsert`` adds it — a row
    KEEPS its existing identity only when the merge key matches
    exactly ONE existing row AND exactly ONE incoming row (true
    UPDATE semantics; a key matching several existing rows is a
    coarser-grain delete-then-insert, and a key arriving with several
    incoming rows — a doc re-chunked 1 -> N — must not stamp one old
    id onto N replacements), all other rows get
    ``high_water + step * rank`` with rank assigned 1..n in merge-key
    order (``ranking.distributed_row_number`` — deterministic, and
    never an unpartitioned window).  ``snapshot_merge_when`` keeps
    the target's identity for every matched row and mints fresh ids
    for inserts; the overwrite paths mint fresh ids for all
    replacement rows (replaced ids are never reused, Delta's rule) —
    their ``where`` predicate must not reference the identity column.
    Writes that minted ids never take the silent disjoint-partition
    rebase (two rivals would derive the same mark and collide); they
    re-run the merge against the winner instead.  The high-water mark
    is DERIVED
    from the committed table (max for positive step, min for
    negative), never stored: a transactional side-register would need
    its own OCC story, while the derived mark is correct by
    construction under restore/time-travel/clone and costs one
    column-pruned aggregate of a table the merge is reading anyway.
    Uniqueness holds for values this engine assigned; like Delta,
    declaring identity on a column with pre-existing caller-written
    values only guarantees no collision with values >= start."""
    if int(step) == 0:
        raise ValueError("identity step must be non-zero")
    _fs_mkdirs(spark, table_path)
    _write_text(
        spark,
        f"{table_path}/{_IDENTITY_CONF}",
        json.dumps(
            {"column": column, "start": int(start), "step": int(step)},
            sort_keys=True,
        ),
    )


def _identity_conf(spark, table_path: str) -> dict | None:
    p = f"{table_path}/{_IDENTITY_CONF}"
    if not _fs_exists(spark, p):
        return None
    return json.loads(_read_text(spark, p))


class SnapshotIdentityViolation(ValueError):
    """An increment supplied values for a GENERATED ALWAYS AS IDENTITY
    column.  Nothing was written."""


def _identity_hwm(existing: DataFrame, c: str, start: int, step: int) -> int:
    """High-water mark of the committed identity values: one
    column-pruned aggregate of a table the write is reading anyway."""
    agg = F.max(F.col(c)) if step > 0 else F.min(F.col(c))
    row = existing.agg(
        F.coalesce(agg, F.lit(start - step)).alias("h")
    ).collect()[0]
    return int(row["h"])


def _mint_identity(
    spark, table_path: str, df: DataFrame, existing: DataFrame | None
) -> DataFrame:
    """GENERATED ALWAYS AS IDENTITY for the pure-insert write paths
    (``snapshot_overwrite_where`` / ``snapshot_insert_overwrite_
    partitions``): every incoming row is an insert (the region it
    replaces dies wholesale), so there is no keep-join — reject
    caller-supplied values and assign ``high_water + step * rank``
    with rank 1..n over a deterministic all-column sort.  The mark
    derives from the FULL committed table (not just surviving rows):
    ids of replaced rows are never reused, matching Delta's
    identity-never-reassigned behavior.  No-op without an identity
    config."""
    conf = _identity_conf(spark, table_path)
    if conf is None:
        return df
    from .ranking import distributed_row_number

    c, start, step = conf["column"], conf["start"], conf["step"]
    if c in df.columns:
        raise SnapshotIdentityViolation(
            f"{c!r} is GENERATED ALWAYS AS IDENTITY — writes must not "
            "supply it"
        )
    hwm = (
        start - step
        if existing is None
        else _identity_hwm(existing, c, start, step)
    )
    order = [F.asc(col) for col in sorted(df.columns)]
    ranked = distributed_row_number(df, order, rank_col="__identity_rn")
    return ranked.withColumn(
        c,
        (F.lit(hwm) + F.lit(step) * F.col("__identity_rn")).cast("long"),
    ).drop("__identity_rn")


def _apply_identity(
    spark, table_path: str, incoming: DataFrame, key: str,
    at_gen: int | None = None,
) -> DataFrame:
    """``at_gen`` PINS the base snapshot the high-water mark derives
    from (r10 advisor, medium): the write path passes the same
    generation it will hand to the commit as ``expected_cur``, so a
    rival landing after the pin surfaces as a commit conflict instead
    of a silent id collision.  ``None`` means "no committed table"
    (the caller read the pointer once and found nothing)."""
    conf = _identity_conf(spark, table_path)
    if conf is None:
        return incoming
    from .ranking import distributed_row_number

    c, start, step = conf["column"], conf["start"], conf["step"]
    if c in incoming.columns:
        raise SnapshotIdentityViolation(
            f"{c!r} is GENERATED ALWAYS AS IDENTITY — increments must "
            "not supply it"
        )
    cur = at_gen
    if cur is None:
        ranked = distributed_row_number(
            incoming, [F.asc(key)], rank_col="__identity_rn"
        )
        return ranked.withColumn(
            c,
            (F.lit(start - step)
             + F.lit(step) * F.col("__identity_rn")).cast("long"),
        ).drop("__identity_rn")
    existing = read_snapshot_table(spark, table_path, at_gen=cur)
    hwm = _identity_hwm(existing, c, start, step)
    # identity is KEPT only where the merge key matches exactly ONE
    # existing row AND exactly ONE incoming row (UPDATE semantics on
    # both sides).  A key matching several existing rows is a
    # coarser-grain delete-then-insert (e.g. the ingest job's
    # parent-keyed chunk merges): the old rows die wholesale, so the
    # replacements are inserts and get fresh ids — and crucially the
    # keep-join can never fan the increment out.  Symmetrically, a key
    # arriving with several incoming rows (a doc re-chunked 1 -> N)
    # must NOT stamp the one old id onto all N replacements — that
    # would mint duplicates, breaking the uniqueness guarantee for
    # engine-assigned values — so those rows also take the fresh-id
    # path (r9 advisor, high).
    inc_n = incoming.groupBy(key).agg(
        F.count(F.lit(1)).alias("__identity_inc_n")
    )
    ex_ids = (
        existing.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("__identity_n"),
            F.first(F.col(c)).alias("__identity_keep"),
        )
        .filter(F.col("__identity_n") == 1)
        .join(inc_n, on=key, how="inner")
        .filter(F.col("__identity_inc_n") == 1)
        .select(key, "__identity_keep")
    )
    j = incoming.join(ex_ids, on=key, how="left")
    olds = (
        j.filter(F.col("__identity_keep").isNotNull())
        .withColumn(c, F.col("__identity_keep"))
        .drop("__identity_keep")
    )
    news = j.filter(F.col("__identity_keep").isNull()).drop(
        "__identity_keep"
    )
    news = distributed_row_number(
        news, [F.asc(key)], rank_col="__identity_rn"
    ).withColumn(
        c,
        (F.lit(hwm) + F.lit(step) * F.col("__identity_rn")).cast("long"),
    ).drop("__identity_rn")
    return olds.unionByName(news)


def _rel_survives_ranges(rel: str, ranges: dict) -> bool:
    """Driver-side PARTITION pruning for the metadata read path: a
    ``p=v`` directory whose value falls outside a range on that
    partition column is dropped before any file is selected.
    Conservative by construction — a value that does not coerce
    cleanly to the bound's type keeps the directory; the exact
    residual filter downstream guarantees correctness either way.
    Hive's NULL directory is skippable (range predicates are
    null-rejecting)."""
    from urllib.parse import unquote

    if not rel:
        return True
    parts = {}
    for seg in rel.split("/"):
        k, _, v = seg.partition("=")
        parts[k] = unquote(v)
    for c, (lo, hi) in ranges.items():
        if c not in parts:
            continue
        raw = parts[c]
        if raw == "__HIVE_DEFAULT_PARTITION__":
            return False
        for bound, op in ((lo, "lo"), (hi, "hi")):
            if bound is None:
                continue
            try:
                if isinstance(bound, bool):
                    v = raw == "true"
                elif isinstance(bound, int):
                    v = int(raw)
                elif isinstance(bound, float):
                    v = float(raw)
                elif isinstance(bound, str):
                    v = raw
                else:
                    continue  # unknown bound type: keep
            except ValueError:
                continue  # not coercible: keep, residual filter decides
            if op == "lo" and v < bound:
                return False
            if op == "hi" and v > bound:
                return False
    return True


def snapshot_analyze(
    spark: SparkSession, table_path: str, cols: list[str]
) -> dict:
    """ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS: one
    column-pruned pass over the committed snapshot computing, per
    column, row/null counts, min/max, and an approximate NDV
    (HyperLogLog++ via approx_count_distinct — a planner statistic,
    not an oracle surface).  Persisted to
    ``_table_stats/<gen>.json`` keyed by the generation it DESCRIBES,
    so staleness is one integer comparison (`snapshot_table_stats`
    reports it); re-run after large merges or OPTIMIZE.  This is the
    table-level tier of the stats family — file-level min/max prune
    reads, table-level NDV/extremes feed join planning and the
    engine's own cost decisions (e.g. neardup_pairs_auto's synopsis
    routing)."""
    cur = _current_gen(spark, table_path)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    df = read_snapshot_table(spark, table_path)
    missing = sorted(set(cols) - set(df.columns))
    if missing:
        raise ValueError(f"no such columns: {missing}")
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"__min__{c}"),
            F.max(c).alias(f"__max__{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls__{c}"),
            F.approx_count_distinct(c).alias(f"__ndv__{c}"),
        ]
    r = df.agg(*aggs).collect()[0]
    out = {
        "gen": cur,
        "rows": r["__rows"],
        "columns": {
            c: {
                "min": _stat_jsonable(r[f"__min__{c}"]),
                "max": _stat_jsonable(r[f"__max__{c}"]),
                "nulls": r[f"__nulls__{c}"],
                "ndv": r[f"__ndv__{c}"],
            }
            for c in cols
        },
    }
    _fs_mkdirs(spark, f"{table_path}/_table_stats")
    _write_text(
        spark,
        f"{table_path}/_table_stats/{cur:08d}.json",
        json.dumps(out, sort_keys=True),
    )
    return out


def snapshot_table_stats(
    spark: SparkSession, table_path: str
) -> dict | None:
    """The newest persisted ANALYZE result plus ``stale`` (whether the
    table has committed past the generation it describes).  None when
    never analyzed."""
    fs, d = _hfs(spark, f"{table_path}/_table_stats")
    if not fs.exists(d):
        return None
    gens = []
    for st in fs.listStatus(d):
        name = st.getPath().getName()
        if name.endswith(".json"):
            try:
                gens.append(int(name[:-5]))
            except ValueError:
                continue
    if not gens:
        return None
    g = max(gens)
    out = json.loads(
        _read_text(spark, f"{table_path}/_table_stats/{g:08d}.json")
    )
    out["stale"] = _current_gen(spark, table_path) != g
    return out


def snapshot_maybe_analyze(
    spark: SparkSession,
    table_path: str,
    cols: list[str],
    max_stale_generations: int = 8,
) -> dict:
    """ANALYZE trigger — the stats member of the engine's trigger
    family: re-analyze when the table was never analyzed or the
    newest stats describe a generation ``max_stale_generations`` or
    more behind the pointer; otherwise one metadata read and done."""
    cur = _current_gen(spark, table_path)
    if cur is None:
        return {"analyzed": False, "reason": "empty table"}
    st = snapshot_table_stats(spark, table_path)
    if st is not None and cur - st["gen"] < max_stale_generations:
        return {
            "analyzed": False, "described_gen": st["gen"], "current": cur,
        }
    out = snapshot_analyze(spark, table_path, cols)
    return {"analyzed": True, "gen": out["gen"], "rows": out["rows"]}
