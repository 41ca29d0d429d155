"""CONVERT TO DELTA parity (`snapshot_convert_from_parquet`): adopt an
existing plain-parquet directory as a snapshot table in one metadata
commit — zero bytes copied — then prove the adopted table is
first-class (merge/delete/time-travel/OPTIMIZE/constraints) and that
the engine NEVER mutates the caller-owned source directory."""
from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from gpt_rag_ingestion_spark.operators import snapshot_table as S


def _source_files(path: str) -> dict[str, float]:
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            out[p] = os.path.getmtime(p)
    return out


def _orders(spark, n=40):
    return spark.createDataFrame(
        [(i, f"x{i % 3}", i * 10) for i in range(n)],
        "k long, b string, v long",
    )


def test_convert_unpartitioned_roundtrip_and_writes(spark, tmp_path):
    src = str(tmp_path / "raw")
    _orders(spark).write.parquet(src)
    t = str(tmp_path / "t")
    g1 = S.snapshot_convert_from_parquet(spark, src, t)
    assert g1 == 1
    before = _source_files(src)
    # read-back equality with the raw directory
    got = {r.k: r.v for r in S.read_snapshot_table(spark, t).collect()}
    want = {r.k: r.v for r in spark.read.parquet(src).collect()}
    assert got == want
    # first-class writes on top: merge + delete, zero source mutation
    S.snapshot_merge_upsert(
        spark, t,
        spark.createDataFrame(
            [(1, "x1", 999), (1000, "x0", 1)], "k long, b string, v long"
        ),
        key="k",
    )
    S.snapshot_delete_keys(
        spark, t, spark.createDataFrame([(2,)], "k long"), key="k"
    )
    got2 = {r.k: r.v for r in S.read_snapshot_table(spark, t).collect()}
    assert got2[1] == 999 and got2[1000] == 1 and 2 not in got2
    # TIME TRAVEL back across the convert boundary: gen 1 IS the raw dir
    back = {
        r.k: r.v
        for r in S.read_snapshot_table(spark, t, at_gen=1).collect()
    }
    assert back == want
    assert _source_files(src) == before  # not a byte touched


def test_convert_partitioned_untouched_partitions_keep_source_ref(
    spark, tmp_path
):
    src = str(tmp_path / "raw")
    _orders(spark).write.partitionBy("b").parquet(src)
    t = str(tmp_path / "t")
    S.snapshot_convert_from_parquet(spark, src, t, partition_cols=["b"])
    m1 = S._read_manifest(spark, t, 1)
    assert set(m1["partitions"]) == {"b=x0", "b=x1", "b=x2"}
    assert set(m1["partitions"].values()) == {src}
    # STRING partition type is pinned by the stored schema
    assert [
        f["type"] for f in m1["schema"]["fields"] if f["name"] == "b"
    ] == ["string"]
    before = _source_files(src)
    # a merge touching only b=x1 leaves the other rels on the source
    S.snapshot_merge_upsert(
        spark, t,
        spark.createDataFrame([(1, "x1", 777)], "k long, b string, v long"),
        key="k", partition_cols=["b"],
    )
    m2 = S._read_manifest(spark, t, 2)
    assert m2["partitions"]["b=x0"] == src
    assert m2["partitions"]["b=x2"] == src
    assert m2["partitions"]["b=x1"] != src
    got = {r.k: r.v for r in S.read_snapshot_table(spark, t).collect()}
    assert got[1] == 777 and got[0] == 0 and len(got) == 40
    assert _source_files(src) == before


def test_convert_optimize_localizes_and_vacuum_never_touches_source(
    spark, tmp_path
):
    src = str(tmp_path / "raw")
    _orders(spark).write.partitionBy("b").parquet(src)
    t = str(tmp_path / "t")
    S.snapshot_convert_from_parquet(spark, src, t, partition_cols=["b"])
    before = _source_files(src)
    S.snapshot_optimize(spark, t, partition_cols=["b"])
    cur = S._current_gen(spark, t)
    refs = set(S._read_manifest(spark, t, cur)["partitions"].values())
    assert src not in refs  # fully localized
    gc = S.snapshot_vacuum(spark, t)
    assert gc["removed_gens"] == 0  # nothing local was superseded
    assert _source_files(src) == before
    got = {r.k: r.v for r in S.read_snapshot_table(spark, t).collect()}
    assert len(got) == 40


def test_convert_guards(spark, tmp_path):
    src = str(tmp_path / "raw")
    _orders(spark).write.parquet(src)
    with pytest.raises(ValueError, match="distinct"):
        S.snapshot_convert_from_parquet(spark, src, src)
    with pytest.raises(FileNotFoundError):
        S.snapshot_convert_from_parquet(
            spark, str(tmp_path / "nope"), str(tmp_path / "t0")
        )
    t = str(tmp_path / "t")
    S.snapshot_convert_from_parquet(spark, src, t)
    with pytest.raises(FileExistsError):
        S.snapshot_convert_from_parquet(spark, src, t)
    with pytest.raises(ValueError, match="partition columns"):
        S.snapshot_convert_from_parquet(
            spark, src, str(tmp_path / "t2"), partition_cols=["nope"]
        )


def test_convert_constraints_and_identity_bind_after(spark, tmp_path):
    src = str(tmp_path / "raw")
    _orders(spark).write.parquet(src)
    t = str(tmp_path / "t")
    S.snapshot_convert_from_parquet(spark, src, t)
    S.snapshot_add_constraint(spark, t, "v_nonneg", "v >= 0")
    with pytest.raises(S.SnapshotConstraintViolation):
        S.snapshot_merge_upsert(
            spark, t,
            spark.createDataFrame(
                [(5000, "x0", -1)], "k long, b string, v long"
            ),
            key="k",
        )
    # adding a constraint the EXISTING (converted) data violates fails
    with pytest.raises(S.SnapshotConstraintViolation):
        S.snapshot_add_constraint(spark, t, "v_big", "v >= 100")


def test_clone_of_converted_table_no_stray_breadcrumbs(spark, tmp_path):
    src = str(tmp_path / "raw")
    _orders(spark).write.parquet(src)
    t = str(tmp_path / "t")
    S.snapshot_convert_from_parquet(spark, src, t)
    c = str(tmp_path / "c")
    S.snapshot_clone(spark, t, c)
    # the clone references the raw dir; no _clones/ litter appears in
    # the caller-owned parent of the raw directory
    assert not os.path.exists(str(tmp_path / "_clones"))
    got = {r.k: r.v for r in S.read_snapshot_table(spark, c).collect()}
    assert len(got) == 40
    # the clone is writable and divergent
    S.snapshot_merge_upsert(
        spark, c,
        spark.createDataFrame([(0, "x0", -5)], "k long, b string, v long"),
        key="k",
    )
    assert {
        r.k: r.v for r in S.read_snapshot_table(spark, t).collect()
    }[0] == 0


def test_convert_crash_legs(spark, tmp_path, monkeypatch):
    """Kill the convert's commit at every metadata mutation, both
    modes: a reader afterwards sees either NO table or the complete
    converted table — never a torn one — and a retried convert
    converges.  (The convert is one `_commit`; this drives the same
    invariants the merge crash sweep proves, through the new
    entry point.)"""
    from tests.test_snapshot_crash_sweep import _Killer, _short_lease

    _short_lease(monkeypatch)
    src = str(tmp_path / "raw")
    _orders(spark).write.parquet(src)
    killer = _Killer(monkeypatch, scope=str(tmp_path))
    for k in range(1, 5):
        for hard in (False, True):
            t = str(tmp_path / f"t-{k}-{int(hard)}")
            killer.arm(k=k, when="after", hard=hard)
            try:
                S.snapshot_convert_from_parquet(spark, src, t)
            except Exception:
                pass
            killer.disarm()
            # reader invariant: absent or complete, never torn
            cur = S._current_gen(spark, t)
            if cur is not None:
                assert S.read_snapshot_table(spark, t).count() == 40
            else:
                import time as _t

                _t.sleep(0.6)  # orphaned claim lease expiry
                try:
                    S.snapshot_convert_from_parquet(spark, src, t)
                except FileExistsError:
                    pass  # the kill landed after the atomic point
                assert S.read_snapshot_table(spark, t).count() == 40
