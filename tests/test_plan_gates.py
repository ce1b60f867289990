"""Both branches of the size-gated plan splits produce identical rows.

q_local_supplier_volume / q_shipping_priority pick between a
broadcast-map shape (orders parquet <= 512 MB) and the classic
bucketable equi-join shape. Local test data is always below the gate,
so the fallback branch would otherwise never execute in CI; these
tests force it by patching the byte probe and compare row-for-row.
"""

from __future__ import annotations

import pytest

from cell_kn_mvp_etl_results_spark.plans import relational


@pytest.mark.parametrize(
    "qname", ["q_local_supplier_volume", "q_shipping_priority"]
)
def test_gate_branches_agree(spark, sf_dir, qname, monkeypatch):
    fn = getattr(relational, qname)
    below = sorted(map(tuple, fn(spark, sf_dir).collect()))
    monkeypatch.setattr(relational, "_path_bytes", lambda *_a: 1 << 62)
    above = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert below == above
    assert len(below) > 0


def test_path_bytes_handles_missing(tmp_path):
    assert relational._path_bytes(str(tmp_path), "no_such_table") == 0
