"""Filesystem-level properties of the OPTIMIZE-style compaction that
the content oracle (compact_small_files vs SELECT * FROM orders)
cannot see: file-count reduction, size targeting, and the disjoint
key ranges that make parquet footer stats prune file reads."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from football_etl_pipeline_spark.operators.maintenance import (
    compact_table,
)
from football_etl_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.01"


def _files(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.startswith("part-") and f.endswith(".parquet")
    )


def test_compaction_reduces_files_and_range_clusters(spark, tmp_path):
    frag = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    orders = load_table(spark, SF, "orders")
    orders.repartition(64).write.mode("overwrite").parquet(frag)
    assert len(_files(frag)) == 64

    n_out = compact_table(
        spark, frag, dst, "o_orderkey", target_bytes=256 * 1024
    )
    out = _files(dst)
    assert len(out) == n_out
    assert 1 < len(out) < 64  # really compacted, still multi-file

    # Disjoint, sorted o_orderkey ranges per file: footer min/max
    # stats must let a point query read exactly ONE file.
    ranges = []
    for f in out:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("o_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file key ranges overlap — no skipping"

    # Losslessness double-check at the row level (the oracle gate
    # asserts this cross-engine; keep a fast in-suite pin too).
    assert spark.read.parquet(dst).count() == orders.count()
