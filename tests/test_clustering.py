"""Connected-components tests: known graphs, convergence, scale shape."""

from pyspark.sql import functions as F

from pseudopeople_spark.linkage.clustering import cluster_records, connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["u", "v"])
    rows = connected_components(df).collect()
    comp = {r["u"]: r["component"] for r in rows}
    return comp


def _groups(comp):
    inv = {}
    for node, c in comp.items():
        inv.setdefault(c, set()).add(node)
    return {frozenset(g | {c}) for c, g in inv.items()}


def test_cc_path_graph(spark):
    comp = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert len({comp.get(i, i) for i in range(1, 6)}) == 1


def test_cc_two_components_and_star(spark):
    comp = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 21)])
    cluster_a = {comp.get(n, n) for n in (10, 11, 12)}
    cluster_b = {comp.get(n, n) for n in (20, 21, 30)}
    assert len(cluster_a) == 1 and len(cluster_b) == 1
    assert cluster_a != cluster_b


def test_cc_large_random_union(spark):
    # 1000 chains of length 4 -> exactly 1000 components of size 4
    edges = []
    for g in range(1000):
        b = g * 10
        edges += [(b, b + 1), (b + 1, b + 2), (b + 2, b + 3)]
    df = spark.createDataFrame(edges, ["u", "v"])
    comp = connected_components(df)
    sizes = comp.groupBy("component").count()
    assert sizes.count() == 1000
    assert sizes.where(F.col("count") != 4).count() == 0


def test_cluster_records_covers_singletons(spark):
    recs = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], ["record_id"])
    edges = spark.createDataFrame([("a", "b")], ["id_l", "id_r"])
    out = cluster_records(edges, recs)
    rows = {r["record_id"]: r["cluster_id"] for r in out.collect()}
    assert len(rows) == 4
    assert rows["a"] == rows["b"]
    assert len({rows["a"], rows["c"], rows["d"]}) == 3
