"""Cache-lifecycle contract (VERDICT r9 #3 / ADVICE r9): every
fingerprint-keyed steady-state memo must EVICT its displaced entry --
unpersist the old frame, drop the old temp view -- when the corpus it
was derived from regenerates, instead of pinning one generation of
serving state per rewrite for the application's lifetime.

The tests regenerate a table in a tmp sf_dir (rewrite => new mtime, the
exact thing the driver does to testdata between rounds) and assert the
stale catalog/persistence state is gone.
"""

from __future__ import annotations

import os
import shutil
import time

import pytest

from cell_kn_mvp_etl_results_spark.sources.readers import (
    _fingerprint,
    evict_where,
)

from conftest import SF_DIR


def _copy_table(tmp_path, name: str) -> str:
    """Copy one table of the test lake into a tmp sf_dir; returns dir."""
    d = str(tmp_path)
    src = os.path.join(SF_DIR, f"{name}.parquet")
    dst = os.path.join(d, f"{name}.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copy2(src, dst)
    return d


def _regenerate(path: str) -> None:
    """In-place rewrite with a guaranteed-new mtime (same bytes)."""
    target = path
    if os.path.isdir(path):
        parts = [p for p in os.listdir(path) if not p.startswith("_")]
        target = os.path.join(path, sorted(parts)[0])
    st = os.stat(target)
    os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))


def test_fingerprint_directory_uses_listing(tmp_path):
    # ADVICE r9: an in-place rewrite of a part file inside a
    # directory-backed parquet table does not change the directory's
    # own mtime -- the fingerprint must see the contained listing.
    d = tmp_path / "t.parquet"
    d.mkdir()
    f = d / "part-00000.parquet"
    f.write_bytes(b"x" * 64)
    fp1 = _fingerprint(str(d))
    time.sleep(0.01)
    st = os.stat(f)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    # the directory's OWN stat is typically unchanged by this; the
    # listing-based fingerprint must still move.
    fp2 = _fingerprint(str(d))
    assert fp1 != fp2


def test_evict_where_runs_finalizer_and_pops():
    cache = {("a", 1): "v1", ("a", 2): "v2", ("b", 1): "v3"}
    seen = []
    n = evict_where(cache, lambda k: k[0] == "a", seen.append)
    assert n == 2
    assert sorted(seen) == ["v1", "v2"]
    assert cache == {("b", 1): "v3"}


def test_evict_where_swallows_finalizer_errors():
    cache = {1: "x"}

    def boom(v):
        raise RuntimeError("already dropped")

    assert evict_where(cache, lambda k: True, boom) == 1
    assert cache == {}


def test_sql_view_evicted_on_regeneration(spark, tmp_path):
    from cell_kn_mvp_etl_results_spark.plans.relational import (
        _SQL_VIEWS,
        _view,
    )

    d = _copy_table(tmp_path, "region")
    name1 = _view(spark, d, "region")
    assert spark.catalog.tableExists(name1)
    _regenerate(os.path.join(d, "region.parquet"))
    name2 = _view(spark, d, "region")
    assert name2 != name1
    # the displaced view is gone from the catalog AND the memo
    assert not spark.catalog.tableExists(name1)
    keys = [k for k in _SQL_VIEWS if k[1] == d and k[2] == "region"]
    assert len(keys) == 1 and _SQL_VIEWS[keys[0]] == name2


def test_minhash_sigs_view_unpersisted_on_regeneration(spark, tmp_path):
    from cell_kn_mvp_etl_results_spark.plans.llmdata import (
        _MINHASH_SIG_VIEWS,
        _minhash_sigs_view,
    )

    d = _copy_table(tmp_path, "documents")
    name1 = _minhash_sigs_view(spark, d)
    ((sigs1, cand1),) = [
        (v[0], v[4]) for k, v in _MINHASH_SIG_VIEWS.items() if k[1] == d
    ]
    assert sigs1.is_cached and cand1.is_cached
    _regenerate(os.path.join(d, "documents.parquet"))
    name2 = _minhash_sigs_view(spark, d)
    assert name2 != name1
    assert not spark.catalog.tableExists(name1)
    assert not sigs1.is_cached  # displaced signatures were unpersisted
    assert not cand1.is_cached  # displaced LSH index was unpersisted
    assert len([k for k in _MINHASH_SIG_VIEWS if k[1] == d]) == 1


def test_upsert_delta_bands_evicted_on_regeneration(
    spark, tmp_path, monkeypatch
):
    # inline mode: the materialized-table layer would otherwise write a
    # new warehouse table per fingerprint, which is not under test here
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "0")
    from cell_kn_mvp_etl_results_spark.plans.extended2 import (
        _UPSERT_DELTA_BANDS,
        pair_index_upsert_pairs,
    )

    d = _copy_table(tmp_path, "documents")
    pair_index_upsert_pairs(spark, d).count()
    keys1 = [k for k in _UPSERT_DELTA_BANDS if k[1] == d]
    assert len(keys1) == 1
    _regenerate(os.path.join(d, "documents.parquet"))
    pair_index_upsert_pairs(spark, d).count()
    keys2 = [k for k in _UPSERT_DELTA_BANDS if k[1] == d]
    assert len(keys2) == 1  # replaced, not accumulated
    assert keys2[0] != keys1[0]


def test_khop_hop_frames_evicted_on_regeneration(spark, tmp_path):
    from cell_kn_mvp_etl_results_spark.plans.graph_queries import (
        _HOP_FRAMES,
        q_khop_paths,
    )

    d = str(tmp_path)
    for t in ("customer", "orders", "lineitem", "supplier", "nation"):
        _copy_table(tmp_path, t)
    q_khop_paths(spark, d).count()
    entries1 = {k: v for k, v in _HOP_FRAMES.items() if k[1] == d}
    assert len(entries1) == 1
    (hops1, term1, views1) = next(iter(entries1.values()))
    assert term1.is_cached
    _regenerate(os.path.join(d, "lineitem.parquet"))
    q_khop_paths(spark, d).count()
    entries2 = {k: v for k, v in _HOP_FRAMES.items() if k[1] == d}
    assert len(entries2) == 1  # replaced, not accumulated
    assert next(iter(entries2)) != next(iter(entries1))
    assert not term1.is_cached
    assert all(not h.is_cached for h in hops1.values())
    for vn in views1.values():
        assert not spark.catalog.tableExists(vn)


def test_incr_cycle_index_unpersisted_on_regeneration(spark, tmp_path):
    # ADVICE r10: q_incremental_cycle's base LSH index was persisted in
    # the plan closure with no eviction path -- it now lives in the
    # same fingerprint-keyed memo contract as every other serving memo.
    import pyspark.sql.functions as F

    from cell_kn_mvp_etl_results_spark.plans.llmdata import (
        _INCR_CYCLE_IDX,
        _incr_cycle_base_index,
    )
    from cell_kn_mvp_etl_results_spark.sources.readers import read_table

    d = _copy_table(tmp_path, "documents")

    def base():
        doc = read_table(spark, d, "documents")
        m = F.col("doc_id") % 10
        return doc.filter((m != 0) & (m != 5))

    idx1 = _incr_cycle_base_index(spark, d, base())
    idx1.count()
    assert idx1.is_cached
    assert len([k for k in _INCR_CYCLE_IDX if k[1] == d]) == 1
    _regenerate(os.path.join(d, "documents.parquet"))
    idx2 = _incr_cycle_base_index(spark, d, base())
    assert idx2 is not idx1
    assert not idx1.is_cached  # displaced index was unpersisted
    assert len([k for k in _INCR_CYCLE_IDX if k[1] == d]) == 1
