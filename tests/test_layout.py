"""Z-order layout (layout.py): exact Morton interleave semantics, the
shared SQL recipe, guard rails, and the actual locality win — per-file
min/max spans shrink on EVERY participating column after the rewrite,
which is the entire point of the operator at 100 TB."""
from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.layout import (
    zorder_layout,
    zorder_value,
    zorder_value_sql,
)


def test_zorder_value_exact_interleave(spark):
    # x=0b101, y=0b011 at bits=3: z bit (b*2) = x bit b, (b*2+1) = y bit b
    # -> 1 + 2 + 8 + 16 = 27 (hand-computed)
    df = spark.range(1).select(
        zorder_value(F.lit(5), F.lit(3), bits=3).alias("z")
    )
    assert df.collect()[0]["z"] == 27
    # single column degenerates to the (masked) value itself
    one = spark.range(1).select(zorder_value(F.lit(9), bits=4).alias("z"))
    assert one.collect()[0]["z"] == 9


def test_zorder_value_masks_out_of_range(spark):
    # 0b10101 at bits=3 clamps to 0b101 — masked, not wrapped/overflowed
    df = spark.range(1).select(
        zorder_value(F.lit(0b10101), F.lit(0), bits=3).alias("z")
    )
    # masked to 0b101; its bits land at even slots 0 and 4 -> 1 + 16
    assert df.collect()[0]["z"] == (1 + 16)


def test_zorder_sql_recipe_matches_engine(spark):
    import duckdb

    rows = spark.range(64).select(
        F.col("id"),
        zorder_value(F.col("id") % 8, (F.col("id") * 3 + 1) % 8, bits=3)
        .alias("z"),
    ).collect()
    got = {r["id"]: r["z"] for r in rows}
    sql = zorder_value_sql(["id % 8", "(id * 3 + 1) % 8"], bits=3)
    want = {
        int(i): int(z)
        for i, z in duckdb.sql(
            f"SELECT id, {sql} AS z FROM range(64) t(id)"
        ).fetchall()
    }
    assert got == want


def test_zorder_value_guards():
    with pytest.raises(ValueError, match="exceeds"):
        zorder_value(F.lit(1), F.lit(1), bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_value(bits=4)


def test_zorder_layout_guards_reserved_names(spark):
    df = spark.range(4).withColumn("_z", F.lit(1))
    with pytest.raises(ValueError, match="_z"):
        zorder_layout(df, ["id"], "/tmp/never", bits=2)


def _file_spans(spark, path, cols):
    """Average per-file (max-min) span of each column — what parquet
    min/max skipping actually sees."""
    spans = {c: [] for c in cols}
    for f in glob.glob(f"{path}/part-*.parquet"):
        row = (
            spark.read.parquet(f)
            .agg(*[
                (F.max(c) - F.min(c)).alias(c) for c in cols
            ])
            .collect()[0]
        )
        for c in cols:
            spans[c].append(row[c])
    return {c: sum(v) / len(v) for c, v in spans.items()}


def test_zorder_layout_improves_locality_on_both_columns(spark, tmp_path):
    # two independent pseudo-random columns: the natural (insertion)
    # order has no locality on either; the z-layout must shrink the
    # average per-file span on BOTH at once
    n = 4096
    df = spark.range(n).select(
        ((F.col("id") * 37 + 11) % 256).alias("x"),
        ((F.col("id") * 101 + 5) % 256).alias("y"),
    )
    nat = str(tmp_path / "natural")
    zed = str(tmp_path / "zorder")
    df.repartition(8).write.parquet(nat)
    zorder_layout(df, ["x", "y"], zed, bits=4, n_files=8)
    nat_spans = _file_spans(spark, nat, ["x", "y"])
    z_spans = _file_spans(spark, zed, ["x", "y"])
    for c in ("x", "y"):
        assert nat_spans[c] > 200  # random layout: files span ~everything
        assert z_spans[c] < 0.6 * nat_spans[c], (c, z_spans, nat_spans)


def test_zorder_layout_handles_nulls(spark, tmp_path):
    df = spark.range(100).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("x"),
        (F.col("id") % 7).alias("y"),
    )
    out = str(tmp_path / "z")
    zorder_layout(df, ["x", "y"], out, bits=3, n_files=4)
    assert spark.read.parquet(out).count() == 100


def test_compaction_plan_bins_and_determinism(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.layout import compaction_plan

    files = spark.createDataFrame(
        [("p", f"f{i}", s) for i, s in enumerate([900, 800, 700, 300, 200, 100])],
        "part string, file string, bytes long",
    )
    plan = compaction_plan(
        files, "bytes", target_bytes=1000, partition_cols=("part",)
    )
    got = {r["file"]: r["bin"] for r in plan.collect()}
    # cumsum-before: 0,900,1700,2400,2700,2900 -> bins 0,0,1,2,2,2
    assert got == {"f0": 0, "f1": 0, "f2": 1, "f3": 2, "f4": 2, "f5": 2}
    stats = {(r["bin"]): (r["bin_bytes"], r["bin_files"]) for r in plan.collect()}
    assert stats[0] == (1700, 2) and stats[2] == (600, 3)

    # an oversized file occupies its own bin
    big = spark.createDataFrame(
        [("p", "huge", 5000), ("p", "tiny", 10)], "part string, file string, bytes long"
    )
    gb = {r["file"]: r["bin"] for r in compaction_plan(
        big, "bytes", target_bytes=1000, partition_cols=("part",)
    ).collect()}
    assert gb["huge"] == 0 and gb["tiny"] == 5

    import pytest as _pytest
    with _pytest.raises(ValueError, match="target_bytes"):
        compaction_plan(files, "bytes", target_bytes=0)


def test_rendezvous_shard_minimal_disruption(spark):
    from xmlschemavalidator_spark.layout import rendezvous_shard

    df = spark.range(0, 4000).select(F.col("id"))
    both = df.select(
        "id",
        rendezvous_shard(F.col("id"), 7).alias("s7"),
        rendezvous_shard(F.col("id"), 8).alias("s8"),
    )
    rows = both.collect()
    # balanced-ish across 7 shards
    from collections import Counter

    c7 = Counter(r["s7"] for r in rows)
    assert set(c7) == set(range(7))
    assert max(c7.values()) < 2.0 * min(c7.values())
    # growing 7 -> 8: movers go ONLY to the new shard, ~1/8 of keys
    movers = [r for r in rows if r["s7"] != r["s8"]]
    assert all(r["s8"] == 7 for r in movers)
    assert 0.06 < len(movers) / len(rows) < 0.20
    # a mod-hash scheme would move ~7/8 of keys; ours moved ~1/8
    assert len(movers) / len(rows) < 0.5


def test_rendezvous_portable_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    from xmlschemavalidator_spark.layout import rendezvous_shard, rendezvous_shard_sql

    df = spark.range(0, 300).select(F.col("id"))
    got = sorted(
        (r["id"], r["shard"])
        for r in df.select(
            "id", rendezvous_shard(F.col("id"), 5, portable=True).alias("shard")
        ).collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": range(300)}))
    oracle = sorted(
        map(
            tuple,
            con.execute(
                f"SELECT id, {rendezvous_shard_sql('id', 5)} AS shard FROM t"
            ).fetchall(),
        )
    )
    assert got == oracle


def test_skip_audit_clustered_vs_shuffled(spark, tmp_path):
    from xmlschemavalidator_spark.layout import parquet_rowgroup_stats, skip_audit

    df = spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 1000).cast("double").alias("v")
    )
    clustered = str(tmp_path / "clustered")
    shuffled = str(tmp_path / "shuffled")
    # clustered: contiguous v ranges per file; shuffled: every file spans all v
    df.withColumn("b", (F.col("v") / 250).cast("int")).repartition(
        "b"
    ).sortWithinPartitions("v").write.partitionBy("b").parquet(clustered)
    df.repartition(4).write.parquet(shuffled)

    sc = parquet_rowgroup_stats(spark, clustered, "v")
    ss = parquet_rowgroup_stats(spark, shuffled, "v")
    [ac] = skip_audit(sc, 100.0, 200.0).collect()
    [ash] = skip_audit(ss, 100.0, 200.0).collect()
    # the clustered layout prunes most row groups; the shuffled one prunes none
    assert ac["n_skippable"] >= ac["n_row_groups"] * 3 // 4
    assert ash["n_skippable"] == 0
    assert ac["n_rows_total"] == ash["n_rows_total"] == 20_000
    assert ac["skip_ratio_micro"] > 700_000 and ash["skip_ratio_micro"] == 0


def test_rowgroup_stats_match_duckdb_metadata(spark, tmp_path):
    import duckdb

    from xmlschemavalidator_spark.layout import parquet_rowgroup_stats

    p = str(tmp_path / "one")
    spark.range(0, 5000).select(
        (F.col("id") % 97).cast("double").alias("v")
    ).coalesce(2).write.parquet(p)
    got = sorted(
        (r["file"], r["row_group"], r["n_rows"], r["min_value"], r["max_value"])
        for r in parquet_rowgroup_stats(spark, p, "v").collect()
    )
    oracle = sorted(
        map(
            tuple,
            duckdb.connect()
            .execute(
                f"""SELECT regexp_extract(file_name, '[^/]+$'), row_group_id,
                       row_group_num_rows,
                       CAST(stats_min_value AS DOUBLE), CAST(stats_max_value AS DOUBLE)
                FROM parquet_metadata('{p}/*.parquet')
                WHERE path_in_schema = 'v'"""
            )
            .fetchall(),
        )
    )
    assert got == oracle and len(got) >= 2


def _py_xy2d(n_bits, x, y):
    mask = (1 << n_bits) - 1
    d = 0
    for b in range(n_bits - 1, -1, -1):
        rx = (x >> b) & 1
        ry = (y >> b) & 1
        d += ((3 * rx) ^ ry) << (2 * b)
        if ry == 0:
            if rx == 1:
                x = mask - x
                y = mask - y
            x, y = y, x
    return d


def test_hilbert_index_exact_bijection_and_unit_steps(spark):
    from xmlschemavalidator_spark.layout import hilbert_index

    bits = 4
    cells = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(cells, "x long, y long")
    got = {(r["x"], r["y"]): r["hilbert_d"]
           for r in hilbert_index(df, "x", "y", bits=bits).collect()}
    # exact replay of the classic xy2d walk
    for (x, y), d in got.items():
        assert d == _py_xy2d(bits, x, y), (x, y)
    # bijection onto [0, 256)
    assert sorted(got.values()) == list(range(256))
    # THE Hilbert property (what Z-order lacks): consecutive d are
    # neighboring cells — |dx|+|dy| == 1, never a quadrant teleport
    by_d = {d: xy for xy, d in got.items()}
    for d in range(255):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_index_sql_parity_and_guards(spark):
    import duckdb
    import pytest as _pt

    from xmlschemavalidator_spark.layout import hilbert_index, hilbert_index_sql

    body = hilbert_index_sql(
        "(SELECT x, y FROM cells)", ["x", "y"], "x", "y", bits=3
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE cells AS SELECT x, y FROM range(8) t(x), range(8) s(y)"
    )
    rows = con.execute(
        f"WITH {body} SELECT x, y, hilbert_d FROM h_out"
    ).fetchall()
    assert {(x, y): d for x, y, d in rows} == {
        (x, y): _py_xy2d(3, x, y) for x in range(8) for y in range(8)
    }
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with _pt.raises(ValueError):
        hilbert_index(df, "x", "y", bits=0)
    with _pt.raises(ValueError):
        hilbert_index(df.withColumn("_hx", F.lit(1)), "x", "y")


def test_hilbert_layout_tightens_both_columns(spark, tmp_path):
    from xmlschemavalidator_spark.layout import (
        hilbert_layout,
        parquet_rowgroup_stats,
    )

    n = 4000
    df = spark.range(n).select(
        (F.col("id") % 63).alias("a"),
        ((F.col("id") * 7) % 61).alias("b"),
    )
    base, hil = str(tmp_path / "base"), str(tmp_path / "hil")
    df.repartition(8).write.mode("overwrite").parquet(base)
    hilbert_layout(df, ["a", "b"], hil, bits=5, n_files=8)
    spans = {}
    for name, path in (("base", base), ("hil", hil)):
        spans[name] = {}
        for c in ("a", "b"):
            st = parquet_rowgroup_stats(spark, path, c).collect()
            spans[name][c] = sum(
                r["max_value"] - r["min_value"] for r in st
            ) / len(st)
    # clustered layout tightens the average row-group span on BOTH columns
    assert spans["hil"]["a"] < 0.8 * spans["base"]["a"]
    assert spans["hil"]["b"] < 0.8 * spans["base"]["b"]
