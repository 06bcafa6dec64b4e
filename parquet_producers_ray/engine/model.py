"""Data model for the keyed sort-then-produce engine.

Reference mapping (SURVEY.md §1):
- ``SourceUpdate<K,V>``  → Dataset with key columns + value columns +
  ``_type`` int8 (0=Add, 1=Update, 2=Delete); Delete rows carry null
  values (``Types/SourceUpdate.cs:10-18``).
- ``ContentRecord<TK,SK,TV>`` → Dataset of target-key cols + source-key
  cols + value cols, sorted by (target_key, source_key)
  (``ParquetProduction.cs:20-25``).
- ``KeyMapping<SK,TK>`` → Dataset of source-key + target-key cols,
  sorted by (source_key, target_key) (``ParquetProduction.cs:23``).

Keys are lists of columns (compound keys = multiple columns, the
Ray-native form of the reference's compound ``IComparer`` chains,
``Util/Comparers.cs:11-30``); descending target order is per-column
flags (``Tests:315-318`` descending-count comparer).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import pyarrow as pa

TYPE_COL = "_type"
ADD, UPDATE, DELETE = 0, 1, 2
SEQ_COL = "_seq"          # emission order within one produce() call
UPD_SEQ_COL = "_upd_seq"  # within-key position of an update row
SK_PREFIX = "_sk_"        # source-key columns as stored in content /
                          # key-mapping tables (the reference stores
                          # TargetKey and SourceKey as separate fields,
                          # which may share a type/name — prefixing keeps
                          # identity stages valid in one Arrow schema)


@dataclass
class StageSpec:
    """One producer stage (reference ``Producer<SK,SV,TK,TV>``,
    Producer.cs:29-99).

    ``produce(key_tuple, values: pa.Table) -> pa.Table`` is the sole
    user transform (F1, ``ParquetProduction.cs:10-11``): called once
    per distinct source key with that key's value rows; returns a table
    with ``target_key + value_columns`` columns in any order/multiplicity.
    """

    name: str
    produce: Callable[[tuple, pa.Table], pa.Table]
    source_key: list
    target_key: list
    value_columns: list
    source_value_columns: list
    out_schema: pa.Schema = None        # fields for target_key + value_columns
    source_schema: pa.Schema = None     # fields for source_key + source values
    target_descending: Optional[list] = None   # per target_key column
    preserver: Optional["SurrogateIdPreserver"] = None
    # Scale path for per-VALUE transforms (U1/U2 map / flat-map shapes,
    # the overwhelmingly common case at web scale): a vectorized batch
    # function instead of one Python call per key.  Contract:
    # ``produce_rows(upsert_batch) -> pa.Table`` with columns
    # target_key + [_sk_<c> for c in source_key] + value_columns +
    # "_row", where _row is the (non-decreasing) index of the
    # originating input row within the given batch.  Only valid when
    # the transform depends on each value row independently, never on
    # the whole per-key group.
    produce_rows: Optional[Callable[[pa.Table], pa.Table]] = None
    # Scale path for per-GROUP transforms (U4-U6 reduce shapes): a
    # vectorized batch function called once per BLOCK instead of once
    # per key.  The engine co-locates complete source-key groups with
    # one keyed exchange and hands the block sorted by (source_key,
    # _upd_seq) with delete rows already resolved.  Contract:
    # ``produce_grouped(batch) -> pa.Table`` with columns target_key +
    # [_sk_<c> for c in source_key] + value_columns; rows of one source
    # key must be contiguous and in emission order (the engine assigns
    # ``_seq`` per source-key run).  Use for grouped aggregates whose
    # per-key Python `produce` call would dominate at 10^12 keys.
    produce_grouped: Optional[Callable[[pa.Table], pa.Table]] = None
    # Arbitrary target-key orderings — the reference's ``IComparer``
    # chains (``Util/Comparers.cs:11-39``; compound supplier+amount
    # comparer ``TestCommand/Program.cs:29-33``).  Ray sorts by column
    # VALUES, so a comparator becomes a derivation: a vectorized
    # ``fn(target_key_table) -> pa.Table`` of derived sort columns
    # (must handle empty input; must be a pure function of the key).
    # The engine computes the derived columns before every
    # target-ordered sort, sorts by them AHEAD of the target-key
    # columns (tie-break), and strips them before persisting —
    # content, mappings, feeds, and surrogate-id allocation order all
    # follow the derived ordering.  ``derived_descending`` gives the
    # per-derived-column direction.  Dataset-path Producer only; the
    # ranged store's range partitioning keys on raw byte order.
    derived_sort_key: Optional[Callable[[pa.Table], pa.Table]] = None
    derived_descending: Optional[list] = None

    def output_schema(self) -> pa.Schema:
        return self.out_schema

    @property
    def source_key_schema(self) -> Optional[pa.Schema]:
        if self.source_schema is None:
            return None
        return pa.schema([self.source_schema.field(c)
                          for c in self.source_key])

    def updates_schema(self) -> pa.Schema:
        return pa.schema(list(self.source_schema)
                         + [pa.field(TYPE_COL, pa.int8())])

    def feed_schema(self) -> pa.Schema:
        return pa.schema(list(self.out_schema)
                         + [pa.field(TYPE_COL, pa.int8()),
                            pa.field(UPD_SEQ_COL, pa.int64())])

    def target_sort_desc(self) -> list:
        d = self.target_descending or [False] * len(self.target_key)
        return list(d)

    @property
    def stored_sk(self) -> list:
        """Source-key column names as stored in content/mapping tables."""
        return [SK_PREFIX + c for c in self.source_key]

    def content_columns(self) -> list:
        return self.target_key + self.stored_sk + self.value_columns

    def mapping_columns(self) -> list:
        return self.stored_sk + self.target_key

    def content_schema(self) -> pa.Schema:
        return pa.schema(
            [self.out_schema.field(c) for c in self.target_key]
            + [self.source_schema.field(c).with_name(SK_PREFIX + c)
               for c in self.source_key]
            + [self.out_schema.field(c) for c in self.value_columns]
            + [pa.field(SEQ_COL, pa.int64())])

    def mapping_schema(self) -> pa.Schema:
        return pa.schema(
            [self.source_schema.field(c).with_name(SK_PREFIX + c)
             for c in self.source_key]
            + [self.out_schema.field(c) for c in self.target_key]
            + [pa.field(SEQ_COL, pa.int64())])


@dataclass
class SurrogateIdPreserver:
    """Deterministic, scale-safe form of the reference's
    ``PreserveKeyValues`` hook (F9, ``ParquetProducerOptions.cs:16-28``)
    for the stable-surrogate-id pattern (U12, ``Tests:558-672``):
    a value column that keeps its value for existing target keys and is
    allocated ``next_id++`` in target-key order for new ones; a key
    deleted and re-added gets a fresh id (``Tests:652-671``).
    """

    id_column: str
    next_id: int = 1


@dataclass
class KeyValuePreserver:
    """The reference's GENERAL ``PreserveKeyValues`` hook (F9,
    ``ParquetProducerOptions.cs:16-28``; invoked at
    ``ParquetProduction.cs:557,597,662``): user code receives a newly
    produced value together with an example previous value stored under
    the same target key and may copy ANY persistent field across —
    created-at stamps, GUIDs, accumulated state — not just an id
    counter (``SurrogateIdPreserver`` is the engine-allocated special
    case).

    Ray-native form is batch-level, not per-row: ``preserve(new_rows,
    examples) -> pa.Table`` where

    - ``new_rows`` is an Arrow table of the add rows' target-key +
      value columns,
    - ``examples`` is row-aligned (same length): for row i it carries
      the previous version's value columns for the SAME target key
      (the first row in stored (tk, sk, _seq) order), or an all-null
      row when the target key has no previous example — the
      reference's nullable second argument,
    - the return value is the table of value columns to store (same
      row count and value-column schema).

    ``preserve`` must be a pure function of its inputs: it runs inside
    ``map_batches`` tasks, once per Arrow batch, on any worker.
    """

    preserve: Callable[[pa.Table, pa.Table], pa.Table]


def empty_updates_table(key_fields: list, value_fields: list) -> pa.Table:
    return pa.schema(list(key_fields) + list(value_fields)
                     + [pa.field(TYPE_COL, pa.int8())]).empty_table()
