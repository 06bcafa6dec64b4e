"""Salted split-and-merge for skewed keys (SURVEY.md §4 partitioning
row; the reference discusses exactly this compound-key trick in user
space, README.md:32-43 — here it is a reusable stage).

A Zipf-skewed key (web hosts!) makes one reducer the straggler in any
hash shuffle.  ``salted_aggregate`` splits every key into ``salt``
sub-keys (uniformly, by row hash), pre-aggregates the salted groups —
the wide exchange now carries ≤ salt rows per hot key instead of every
row — then merges the partials in a second, tiny shuffle.  Only valid
for associative aggregations; the merge spec says how partials combine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def add_salt(batch: pa.Table, salt: int, col: str = "_salt") -> pa.Table:
    """Uniform per-row salt (row-position based: cheap, deterministic
    enough for load-spreading; the final merge removes it)."""
    n = len(batch)
    return batch.append_column(
        col, pa.array(np.arange(n, dtype=np.int64) % salt))


def salted_aggregate(ds, key, partial_aggs: list, merge_aggs: list,
                     salt: int = 16):
    """Two-level aggregation: groupby(key + salt) with `partial_aggs`,
    then groupby(key) with `merge_aggs` over the partial columns.

    partial_aggs / merge_aggs: ray.data.aggregate.AggregateFn lists.
    The caller names partial outputs so merge_aggs can reference them.
    """
    key = [key] if isinstance(key, str) else list(key)
    salted = ds.map_batches(add_salt, batch_format="pyarrow",
                            fn_kwargs={"salt": salt})
    partial = salted.groupby(key + ["_salt"]).aggregate(*partial_aggs)
    return partial.groupby(key).aggregate(*merge_aggs)


def salted_sum_count(ds, key, value_col: str, salt: int = 16,
                     sum_name: str = "total", count_name: str = "cnt"):
    """The common case: per-key SUM + COUNT, skew-safe."""
    from ray.data.aggregate import Count, Sum
    key_l = [key] if isinstance(key, str) else list(key)
    salted = ds.map_batches(add_salt, batch_format="pyarrow",
                            fn_kwargs={"salt": salt})
    partial = (salted.groupby(key_l + ["_salt"])
               .aggregate(Sum(value_col, alias_name="_psum"),
                          Count(value_col, alias_name="_pcnt")))
    return (partial.groupby(key_l)
            .aggregate(Sum("_psum", alias_name=sum_name),
                       Sum("_pcnt", alias_name=count_name)))
