"""Source/sink round-trips: parquet (partitioned), csv, json."""

from __future__ import annotations

import pandas as pd

from pontem_spark.sources import read_csv, read_json, read_parquet, write_parquet
from pontem_spark.sources.tables import load_table


def test_parquet_roundtrip_partitioned(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_status")
    write_parquet(orders, out, partition_by=["o_orderstatus"])

    back = read_parquet(spark, out)
    assert back.count() == orders.count()
    # partition pruning: reading one status must scan only that partition
    one = read_parquet(spark, out).filter("o_orderstatus = 'F'")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or "o_orderstatus" in plan


def test_csv_roundtrip_with_schema(spark, tmp_path):
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    src = str(tmp_path / "data.csv")
    pdf.to_csv(src, index=False)
    df = read_csv(spark, src, schema="a bigint, b string")
    assert df.schema.simpleString() == "struct<a:bigint,b:string>"
    assert sorted(r["a"] for r in df.collect()) == [1, 2, 3]


def test_json_roundtrip_with_schema(spark, tmp_path):
    src = str(tmp_path / "data.json")
    with open(src, "w") as f:
        f.write('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    df = read_json(spark, src, schema="k bigint, v string")
    assert df.count() == 2
    assert sorted(r["k"] for r in df.collect()) == [1, 2]


def test_csv_json_writers_roundtrip(spark, sf_dir, tmp_path):
    from pontem_spark.sources import write_csv, write_json

    nation = load_table(spark, sf_dir, "nation")
    write_csv(nation, str(tmp_path / "n_csv"))
    back_csv = read_csv(spark, str(tmp_path / "n_csv"), schema="n_nationkey int, n_name string, n_regionkey int")
    assert back_csv.count() == 25

    write_json(nation, str(tmp_path / "n_json"))
    back_json = read_json(spark, str(tmp_path / "n_json"), schema="n_nationkey int, n_name string, n_regionkey int")
    assert back_json.count() == 25


def test_cluster_conf_sizing():
    from pontem_spark.session import cluster_conf

    conf = cluster_conf(executors=1000, cores_per_executor=4)
    assert conf["spark.sql.shuffle.partitions"] == str(2 * 4000)
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert int(conf["spark.sql.autoBroadcastJoinThreshold"]) == 64 * 1024 * 1024


def test_orc_roundtrip_pruned(spark, sf_dir, tmp_path):
    from pontem_spark.sources import read_orc, write_orc

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(orders, out, partition_by=["o_orderstatus"])
    back = read_orc(spark, out)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)
    # predicate + column pruning survive the format swap
    one = read_orc(spark, out, columns=["o_orderkey", "o_orderstatus"]).filter(
        "o_orderstatus = 'F'"
    )
    n_f = orders.filter("o_orderstatus = 'F'").count()
    assert one.count() == n_f
