"""Driver-facing query registry: Ray Data pipelines + DuckDB oracle SQL.

Each entry implements one operator pattern from SURVEY.md §2 over the
driver's testdata tables (region nation customer supplier part orders
lineitem events documents embeddings).  Column names of every computed
column match the SQL aliases exactly (driver hash-compares values after
sorting columns by name).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


# ---------------------------------------------------------------------------
# U1 — per-record projection / re-key (map)

def q_u1_projection(sf_dir: str):
    """SURVEY §2.2 U1 (reference `ByUniqueId`,
    TestCommand/Program.cs:53-59): 1→1 projection with computed column."""
    def project(b: pa.Table) -> pa.Table:
        revenue = pc.multiply(b.column("l_extendedprice"),
                              pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_linenumber": b.column("l_linenumber"),
            "revenue": revenue,
        })
    return _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_extendedprice",
                  "l_discount"]).map_batches(project, batch_format="pyarrow")


SQL_U1 = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
"""


# ---------------------------------------------------------------------------
# U2 — flat-map / tokenizer (reference word splitting, Tests:276-285)

def q_u2_tokenize(sf_dir: str):
    def tokenize(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(b.column("text")), " ")
        n = pc.list_value_length(words).fill_null(0).to_numpy(
            zero_copy_only=False)
        import numpy as np
        doc_id = np.repeat(b.column("doc_id").to_numpy(zero_copy_only=False), n)
        flat = pc.list_flatten(words)
        return pa.table({"doc_id": pa.array(doc_id, type=pa.int64()),
                         "word": flat})
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tokenize, batch_format="pyarrow")


SQL_U2 = """
SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
FROM documents
"""


# ---------------------------------------------------------------------------
# U3 — group-level filter (emit only groups with ≥ N members,
# reference README.md:53-58 email-groups example)

def q_u3_group_filter(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count
    counts = (_read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
              .groupby("o_custkey")
              .aggregate(Count("o_orderkey", alias_name="n_orders")))
    return counts.filter(expr="n_orders >= 3")


SQL_U3 = """
SELECT o_custkey, count(o_orderkey) AS n_orders
FROM orders GROUP BY o_custkey HAVING count(o_orderkey) >= 3
"""


# ---------------------------------------------------------------------------
# U4/U5 — grouped multi-aggregate (reference ProjectStuff, Tests:161-182)

def q_u5_multi_agg(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum
    return (_read(sf_dir, "lineitem",
                  ["l_returnflag", "l_linestatus", "l_quantity",
                   "l_extendedprice"])
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                       Max("l_extendedprice", alias_name="max_price"),
                       Min("l_extendedprice", alias_name="min_price"),
                       Count("l_quantity", alias_name="n")))


SQL_U5 = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       max(l_extendedprice) AS max_price,
       min(l_extendedprice) AS min_price,
       count(l_quantity) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# U6 — partial/final aggregation (reference salary-average example,
# README.md:32-43).  Partials are combined inside map_batches before the
# shuffle — the at-scale pattern for low-cardinality keys.

def q_u6_partial_avg(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        g = b.group_by("o_orderpriority").aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")])
        return g.rename_columns(["o_orderpriority", "psum", "pcnt"])

    partials = _read(sf_dir, "orders",
                     ["o_orderpriority", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow")
    merged = (partials.groupby("o_orderpriority")
              .aggregate(Sum("psum", alias_name="total"),
                         Sum("pcnt", alias_name="cnt")))

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "avg_price": pc.divide(b.column("total"),
                                   pc.cast(b.column("cnt"), pa.float64())),
        })
    return merged.map_batches(finalize, batch_format="pyarrow")


SQL_U6 = """
SELECT o_orderpriority, sum(o_totalprice) / count(o_totalprice) AS avg_price
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# U7 — global sort / top-k with descending custom order (reference
# wordCounts descending comparer, Tests:312-318)

def q_u7_topk(sf_dir: str):
    from ray.data.aggregate import Sum
    return (_read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
            .groupby("l_partkey")
            .aggregate(Sum("l_quantity", alias_name="total_qty"))
            .sort(["total_qty", "l_partkey"], descending=[True, False])
            .limit(10))


SQL_U7 = """
SELECT l_partkey, sum(l_quantity) AS total_qty
FROM lineitem GROUP BY l_partkey
ORDER BY total_qty DESC, l_partkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# U8 — whole-dataset sort (reference constant-key bootstrap README:45-59;
# Ray needs no trick, `ds.sort` is the operator)

def q_u8_sort(sf_dir: str):
    return (_read(sf_dir, "events", ["event_id", "ts", "event_type"])
            .sort(["ts", "event_id"])
            .limit(100))


SQL_U8 = """
SELECT event_id, ts, event_type FROM events ORDER BY ts, event_id LIMIT 100
"""


# ---------------------------------------------------------------------------
# U9 — union of homogeneous sources (reference idsByWord 2-feeder merge,
# Tests:366)

def q_u9_union(sf_dir: str):
    a = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda b: pa.table({"nationkey": b.column("c_nationkey")}),
        batch_format="pyarrow")
    b = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": t.column("s_nationkey")}),
        batch_format="pyarrow")
    from ray.data.aggregate import Count
    return a.union(b).groupby("nationkey").aggregate(
        Count("nationkey", alias_name="n_parties"))


SQL_U9 = """
SELECT nationkey, count(nationkey) AS n_parties FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) GROUP BY nationkey
"""


# ---------------------------------------------------------------------------
# U10 — join (reference multi-source co-grouped Produce, README.md:67-71)

def q_u10_join(sf_dir: str):
    from ray.data.aggregate import Sum
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    li = (_read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
          .groupby("l_orderkey")
          .aggregate(Sum("l_extendedprice", alias_name="order_value")))
    joined = orders.join(li, join_type="inner", num_partitions=16,
                         on=("o_orderkey",), right_on=("l_orderkey",))
    from ray.data.aggregate import Count, Sum as S2
    return (joined.groupby("o_orderstatus")
            .aggregate(S2("order_value", alias_name="total_value"),
                       Count("o_orderkey", alias_name="n_orders")))


SQL_U10 = """
SELECT o_orderstatus, sum(order_value) AS total_value,
       count(o_orderkey) AS n_orders
FROM orders JOIN (
  SELECT l_orderkey, sum(l_extendedprice) AS order_value
  FROM lineitem GROUP BY l_orderkey
) li ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# U11 — exact distinct (reference DistinctUntilChanged on sorted keys,
# ParquetProduction.cs:204)

def q_u11_distinct(sf_dir: str):
    # pre-distinct inside each batch before the hash shuffle (at scale
    # this collapses the exchange to ~#distinct rows per block)
    def local_distinct(b: pa.Table) -> pa.Table:
        return b.group_by(["l_returnflag", "l_linestatus"]).aggregate([])
    return (_read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
            .map_batches(local_distinct, batch_format="pyarrow")
            .groupby(["l_returnflag", "l_linestatus"])
            .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow"))


SQL_U11 = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


# ---------------------------------------------------------------------------
# U14 — scalar functions (string/math/date) inside map_batches
# (reference Split/Math.Abs/concat — Tests:280, Program.cs:66)

def q_u14_scalars(sf_dir: str):
    def fn(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "abs_price": pc.abs(pc.subtract(b.column("o_totalprice"),
                                            pa.scalar(100000.0))),
            "status_lower": pc.utf8_lower(b.column("o_orderstatus")),
            "order_year": pc.year(b.column("o_orderdate")),
            "priority_code": pc.utf8_slice_codeunits(
                b.column("o_orderpriority"), 0, 1),
        })
    return _read(sf_dir, "orders",
                 ["o_orderkey", "o_totalprice", "o_orderstatus",
                  "o_orderdate", "o_orderpriority"]).map_batches(
        fn, batch_format="pyarrow")


SQL_U14 = """
SELECT o_orderkey,
       abs(o_totalprice - 100000.0) AS abs_price,
       lower(o_orderstatus) AS status_lower,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       substr(o_orderpriority, 1, 1) AS priority_code
FROM orders
"""


# ---------------------------------------------------------------------------
# flagship round-trip: encode documents with codec auto-selection,
# decode back — driver checks equality against SELECT * (proves
# bit-identity through the whole Ray pipeline)

def q_encode_roundtrip(sf_dir: str, tmp_base: str = "/tmp/ppray_entry"):
    import shutil

    import ray.data as rd

    from .flagship import decode_pipeline, encode_pipeline

    out = os.path.join(tmp_base,
                       os.path.basename(os.path.normpath(sf_dir)), "docs_enc")
    shutil.rmtree(out, ignore_errors=True)
    ds = _read(sf_dir, "documents")
    man = encode_pipeline(ds, out, num_buckets=8, key="doc_id")
    man.materialize()
    return decode_pipeline(out)


SQL_ENCODE_ROUNDTRIP = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


REGISTRY = {
    "u1_projection": (q_u1_projection, SQL_U1),
    "u2_tokenize": (q_u2_tokenize, SQL_U2),
    "u3_group_filter": (q_u3_group_filter, SQL_U3),
    "u5_multi_agg": (q_u5_multi_agg, SQL_U5),
    "u6_partial_avg": (q_u6_partial_avg, SQL_U6),
    "u7_topk": (q_u7_topk, SQL_U7),
    "u8_sort": (q_u8_sort, SQL_U8),
    "u9_union": (q_u9_union, SQL_U9),
    "u10_join": (q_u10_join, SQL_U10),
    "u11_distinct": (q_u11_distinct, SQL_U11),
    "u14_scalars": (q_u14_scalars, SQL_U14),
    "encode_roundtrip": (q_encode_roundtrip, SQL_ENCODE_ROUNDTRIP),
}


def queries():
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql():
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql}
