"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB.  Ray is initialised by the driver BEFORE this module is
imported: nothing here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: columnar encode of
    the documents table with codec auto-selection, decoded back
    (bit-identical round-trip) — returns the decoded Dataset."""
    from parquet_producers_ray.pipelines.queries import q_encode_roundtrip
    return q_encode_roundtrip("/root/testdata/sf0.001",
                              tmp_base="/tmp/ppray_entry_smoke")


def queries() -> dict[str, Callable[[str], Any]]:
    from parquet_producers_ray.pipelines import queries as Q
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    from parquet_producers_ray.pipelines import queries as Q
    return Q.oracle_sql()
