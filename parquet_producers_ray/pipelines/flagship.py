"""Flagship pipeline: url-keyed columnar encode of web-page Parquet.

    read_parquet → hash-bucket by url → per-bucket sort(url) + encode
    (codec auto-selection) → write encoded segment Parquet + lineage
    manifest per partition → decode/verify path back.

This is the engine's signature pipeline per ``BASELINE.json``: the
reference's keyed sort-then-produce (``ParquetProduction.cs:20-25`` —
content persisted sorted by key) re-expressed as Ray Data shuffles,
with the encoding layer made explicit.

Scale notes (100 TB / multi-node):
- partitioning is ONE hash shuffle on ``url`` (urls are unique, so the
  hash is uniform even when hosts are Zipf-skewed; host-level skew is
  handled separately by stages/skew.py for host-keyed aggregations);
- ``num_buckets`` targets ~128 MiB of input per partition so a batch ×
  concurrency fits worker heaps and the object store streams/spills;
- partition ids are pure functions of the data (fnv1a(url) % P), so a
  resumed run reproduces the same membership and can skip completed
  partitions via their manifests;
- output is many small immutable partition files, never one giant file.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..engine import manifest as mf
from ..stages.encode import decode_segment, encode_table

# Measured locally (BASELINE.md): encode throughput peaks with ~16-32 MiB
# partitions — the per-task sort + FSST temporaries blow caches well
# before the 128 MiB "classic" target; on real multi-node hardware this
# is a tunable, and partition counts stay data-derived either way.
DEFAULT_TARGET_PARTITION_BYTES = 32 * 1024 * 1024

# Bucket membership is the store's PHYSICAL LAYOUT CONTRACT: resume
# skips completed partitions and lookup() routes point reads by
# recomputing the bucket, so the hash that wrote a store must be the
# hash that reads it.  The identifier is stamped into _meta.json at
# encode time and verified on resume/lookup — a store written under a
# different scheme (round-1 stores used crc32) fails LOUDLY instead of
# silently missing keys.  Bump this when add_bucket's hashing changes.
BUCKET_HASH_ID = "splitmix64-int/fnv1a-bytes-v2"


def _check_bucket_hash(meta: dict, where: str) -> None:
    stamped = meta.get("bucket_hash")
    if stamped is not None and stamped != BUCKET_HASH_ID:
        raise ValueError(
            f"{where}: store was encoded with bucket hash "
            f"{stamped!r} but this build computes {BUCKET_HASH_ID!r} — "
            "bucket membership would not match; re-encode from source "
            "data (run_pipeline.py encode) or use the matching build")


def add_bucket(batch: pa.Table, num_buckets: int,
               key: str = "url") -> pa.Table:
    col = batch.column(key).combine_chunks()
    if pa.types.is_integer(col.type) or pa.types.is_temporal(col.type):
        v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        # splitmix64 finalizer — stable across processes/platforms
        h = v.astype(np.uint64, copy=True)
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
        buckets = (h % np.uint64(num_buckets)).astype(np.int64)
    else:
        # vectorized FNV-1a over the flat byte buffer (functions/text.py)
        # — no per-row Python in the flagship's map side.  The bucket id
        # stays a pure function of the key bytes, so resume and lookup()
        # (both routed through add_bucket) reproduce membership.
        from ..functions.text import fnv1a_hash
        h = fnv1a_hash(col)
        buckets = (h % np.uint64(num_buckets)).astype(np.int64)
    return batch.append_column("_bucket", pa.array(buckets))


def _pack_table(t: pa.Table) -> bytes:
    """Arrow IPC stream + zstd: the shuffle-compression wire format."""
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression="zstd")
    with pa.ipc.new_stream(sink, t.schema, options=opts) as w:
        w.write_table(t)
    return sink.getvalue().to_pybytes()


def _unpack_table(blob) -> pa.Table:
    return pa.ipc.open_stream(pa.BufferReader(blob)).read_all()


def pack_buckets(batch: pa.Table, num_buckets: int,
                 key: str = "url") -> pa.Table:
    """Shuffle compression: reduce each input block to one zstd'd Arrow
    IPC blob PER BUCKET before the hash exchange, so the all-to-all
    ships ~¼ of the raw bytes (web text compresses ~4×; measured 3.95×
    on the bench input at ~127 MB/s pack, ~550 MB/s unpack per core).
    This is the map-side of every production shuffle (Spark compresses
    shuffle files the same way) and the right trade when the exchange
    crosses a NETWORK: idle CPU for wire bytes.  On THIS single-node
    sandbox it is ~10% slower than raw rows — local plasma transfers
    are memcpy-speed, so the byte cut buys nothing (A/B in
    BASELINE.md) — hence ``encode_pipeline`` defaults to raw and
    exposes this as the multi-node knob."""
    batch = add_bucket(batch, num_buckets, key)
    batch = batch.sort_by("_bucket")
    buckets = batch.column("_bucket").to_numpy(zero_copy_only=False)
    bounds = np.flatnonzero(np.diff(buckets)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(batch)]))
    payload = batch.drop_columns(["_bucket"])
    ids, blobs, nrows = [], [], []
    for s, e in zip(starts, ends):
        ids.append(int(buckets[s]))
        blobs.append(_pack_table(payload.slice(s, e - s)))
        nrows.append(int(e - s))
    return pa.table({
        "_bucket": pa.array(ids, pa.int64()),
        "blob": pa.array(blobs, pa.large_binary()),
        "blob_rows": pa.array(nrows, pa.int64())})


class BucketEncoder:
    """Per-partition encode + persist, with manifest-based resume.

    Actor-pool ``map_batches`` stage fed by the hash repartition on
    ``_bucket`` (whole blocks as batches): every bucket's rows are
    guaranteed co-located in one block, so each batch splits into
    complete buckets.  One actor encodes many partitions over its
    lifetime — per-actor state (e.g. pinned codec rankings) persists
    across batches.  Emits one manifest row per partition.
    """

    def __init__(self, out_dir: str, sort_key: str = "url",
                 allowed: list | None = None, resume: bool = True,
                 compression: str = "zstd", zstd_level: int = 9):
        self.out_dir = out_dir
        self.sort_key = sort_key
        self.allowed = allowed
        self.resume = resume
        self.compression = compression
        # level 9 ≈ 11 % fewer stored bytes than zstd's default 3 for
        # ~0.8 s/partition of encode CPU — which is OFF the critical
        # path (the exchange dominates); measured on the bench
        # partition: 8.73 → 7.78 MB.  Level 15 buys 25 % but at 66×
        # the write cost — wrong side of the trade for a hot path.
        self.zstd_level = zstd_level

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _manifest_rows([])
        batch = batch.sort_by("_bucket")
        buckets = batch.column("_bucket").to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.diff(buckets)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(batch)]))
        packed = "blob" in batch.column_names
        rows = []
        for s, e in zip(starts, ends):
            part = int(buckets[s])
            sl = batch.slice(s, e - s)
            if packed:   # shuffle-compressed: unpack this bucket's blobs
                group = pa.concat_tables(
                    [_unpack_table(b)
                     for b in sl.column("blob").to_pylist()])
            else:
                group = sl.drop_columns(["_bucket"])
            rows.extend(self._encode_group(part, group).to_pylist())
        return pa.Table.from_pylist(rows, schema=MANIFEST_ROW_SCHEMA)

    def _encode_group(self, part: int, group: pa.Table) -> pa.Table:
        data_path, man_path = mf.partition_paths(self.out_dir, part)

        if self.resume:
            done = mf.completed_partition(self.out_dir, part)
            if done is not None and done.get("rows") == group.num_rows:
                done = dict(done)
                done["skipped"] = True
                return _manifest_rows([done])

        t0 = time.perf_counter()
        if self.sort_key in group.column_names:
            group = group.sort_by(self.sort_key)
        seg, choices = encode_table(group, self.allowed)
        enc_bytes = int(sum(
            len(b) for row in seg.column("buffers").to_pylist() for b in row))
        tmp = data_path + ".tmp"
        # one row group per column row: a column-pruned read
        # (decode_pipeline(columns=...), lookup()) skips the html/text
        # payload bytes entirely via row-group statistics on `column`
        pq.write_table(seg, tmp, compression=self.compression,
                       compression_level=(self.zstd_level
                                          if self.compression == "zstd"
                                          else None),
                       row_group_size=1)
        os.replace(tmp, data_path)
        payload = {
            "part": part,
            "rows": group.num_rows,
            "input_bytes": int(group.nbytes),
            "encoded_bytes": enc_bytes,
            "data_size": os.path.getsize(data_path),
            "codecs": choices,
            "sort_key": self.sort_key,
            "key_digest": mf.column_digest(group.column(self.sort_key))
            if self.sort_key in group.column_names else "",
            "encode_sec": round(time.perf_counter() - t0, 4),
            "file": os.path.basename(data_path),
            "skipped": False,
        }
        mf.write_manifest(man_path, payload)
        return _manifest_rows([payload])


SPILL_ROW_SCHEMA = pa.schema([
    pa.field("part", pa.int64()),
    pa.field("file", pa.string()),
    pa.field("rows", pa.int64()),
    pa.field("bytes", pa.int64()),
])


def spill_buckets(batch: pa.Table, num_buckets: int, shuffle_dir: str,
                  key: str = "url", codec: str = "lz4") -> pa.Table:
    """Map side of the STORAGE-BACKED exchange: write one compressed
    Arrow IPC spill file per (input block, bucket) under the bucket's
    own directory, bypassing the object store entirely — the
    shuffle-service pattern (Spark external shuffle / Magnet / cloud
    shuffle storage).  Spill names carry a fresh per-invocation tag
    (two blocks can never collide, even byte-identical ones); retry
    safety comes from the reduce side consuming ONLY the files the
    materialized spill manifest records, so a failed attempt's orphans
    are ignored.  The manifest flows as a metadata Dataset — no
    driver-side path state at any scale.  On multi-node, `shuffle_dir`
    lives on the shared store the encoded output already targets.
    ``codec``: lz4 (default) is the local-throughput choice; pick zstd
    when spills cross a slow network or constrained shared store (the
    reader auto-detects either)."""
    import uuid as _uuid

    batch = add_bucket(batch, num_buckets, key)
    batch = batch.sort_by("_bucket")
    buckets = batch.column("_bucket").to_numpy(zero_copy_only=False)
    bounds = np.flatnonzero(np.diff(buckets)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(batch)]))
    payload = batch.drop_columns(["_bucket"])
    opts = pa.ipc.IpcWriteOptions(compression=codec)
    rows = []
    # one fresh tag per INVOCATION: spill names must be unique per
    # (block, bucket) — content-digest names collided whenever two
    # different blocks produced byte-identical key slices (duplicate
    # input blocks, hot constant keys), silently dropping rows.
    # Retry-safety moves to the REDUCE side: only files recorded in
    # the materialized spill manifest are read, so a failed attempt's
    # orphans are never consumed (see encode_pipeline).
    tag = _uuid.uuid4().hex[:16]
    for s, e in zip(starts, ends):
        part = int(buckets[s])
        sl = payload.slice(s, e - s)
        d = os.path.join(shuffle_dir, f"b{part:05d}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{tag}_{s}.arrows")
        tmp = f"{path}.{os.getpid()}.tmp"
        with pa.OSFile(tmp, "wb") as f, \
                pa.ipc.new_stream(f, sl.schema, options=opts) as w:
            w.write_table(sl)
        os.replace(tmp, path)
        rows.append({"part": part, "file": os.path.basename(path),
                     "rows": int(e - s),
                     "bytes": os.path.getsize(path)})
    return pa.Table.from_pylist(rows, schema=SPILL_ROW_SCHEMA)


MANIFEST_ROW_SCHEMA = pa.schema([
    pa.field("part", pa.int64()),
    pa.field("rows", pa.int64()),
    pa.field("input_bytes", pa.int64()),
    pa.field("encoded_bytes", pa.int64()),
    pa.field("data_size", pa.int64()),
    pa.field("codecs", pa.string()),
    pa.field("encode_sec", pa.float64()),
    pa.field("file", pa.string()),
    pa.field("skipped", pa.bool_()),
])


def _manifest_rows(payloads: list) -> pa.Table:
    rows = [{
        "part": p["part"], "rows": p["rows"],
        "input_bytes": p["input_bytes"],
        "encoded_bytes": p["encoded_bytes"],
        "data_size": p["data_size"],
        "codecs": json.dumps(p["codecs"], sort_keys=True),
        "encode_sec": p.get("encode_sec", 0.0),
        "file": p["file"], "skipped": bool(p.get("skipped", False)),
    } for p in payloads]
    return pa.Table.from_pylist(rows, schema=MANIFEST_ROW_SCHEMA)


class StorageBucketEncoder(BucketEncoder):
    """Reduce side of the storage-backed exchange: each task lists its
    bucket's spill directory, merges + sorts + encodes exactly like the
    object-store path (same `_encode_group`, same manifests, same
    resume), then removes its spills."""

    def __init__(self, out_dir: str, shuffle_dir: str,
                 sort_key: str = "url", allowed: list | None = None,
                 resume: bool = True, compression: str = "zstd",
                 zstd_level: int = 9):
        super().__init__(out_dir, sort_key, allowed, resume, compression,
                         zstd_level)
        self.shuffle_dir = shuffle_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import glob as _glob
        import json as _json
        import shutil as _shutil
        rows = []
        has_lists = "files" in batch.column_names
        for i, part in enumerate(batch.column("part").to_pylist()):
            part = int(part)
            d = os.path.join(self.shuffle_dir, f"b{part:05d}")
            if has_lists:
                # read EXACTLY the files the materialized spill
                # manifest recorded — orphans from failed/retried map
                # attempts in the same directory are never consumed
                recorded = [os.path.join(d, f) for f in
                            _json.loads(batch.column("files")[i].as_py())]
                files = [p for p in recorded if os.path.exists(p)]
                if files and len(files) < len(recorded):
                    # SOME recorded spills vanished: a prior reduce
                    # attempt died mid-rmtree.  Its encode either
                    # completed (partition manifest present → resume,
                    # exactly like the all-missing branch) or it
                    # didn't — and encoding the surviving SUBSET would
                    # silently drop rows from a partition that can
                    # never be reconstructed.  Raise so Ray's retry
                    # surfaces the loss instead of laundering it.
                    done = mf.completed_partition(self.out_dir, part)
                    if done is not None:
                        done = dict(done)
                        done["skipped"] = True
                        rows.extend(_manifest_rows([done]).to_pylist())
                        _shutil.rmtree(d, ignore_errors=True)
                        continue
                    missing = sorted(os.path.basename(p) for p in recorded
                                     if not os.path.exists(p))
                    raise RuntimeError(
                        f"bucket {part}: {len(missing)}/{len(recorded)} "
                        f"manifest-recorded spill files missing with no "
                        f"completed partition manifest — partial spill "
                        f"loss, refusing to encode a subset: {missing[:5]}")
            else:
                files = sorted(_glob.glob(os.path.join(d, "*.arrows")))
            if not files:
                # spills already consumed by a completed earlier run
                done = mf.completed_partition(self.out_dir, part)
                if done is not None:
                    done = dict(done)
                    done["skipped"] = True
                    rows.extend(_manifest_rows([done]).to_pylist())
                continue
            tabs = []
            for p in files:
                with pa.OSFile(p) as f:
                    tabs.append(pa.ipc.open_stream(f).read_all())
            group = pa.concat_tables(tabs)
            rows.extend(self._encode_group(part, group).to_pylist())
            _shutil.rmtree(d, ignore_errors=True)
        return pa.Table.from_pylist(rows, schema=MANIFEST_ROW_SCHEMA)


def read_input(path: str, target_block_bytes: int = 128 * 1024 * 1024):
    """read_parquet with block sizing for an all-to-all consumer:
    Ray's default read splitting targets hundreds of small blocks,
    which multiplies shuffle overhead (#blocks × #partitions object
    transfers).  Aim for ~128 MiB in-memory blocks instead (file bytes
    × ~3 decompression factor) — but also at least one block per CPU
    so the shuffle's map side isn't starved of parallelism on small
    inputs (measured on the 566 MB bench input: at 16 CPUs 5 blocks =
    64 MB/s vs 8 blocks = 80 MB/s; at 32 CPUs the spill stage is 2×
    faster with 32 blocks than 16).  At 100 TB the bytes term
    dominates and both floors are irrelevant."""
    import glob as _glob

    import ray
    import ray.data

    files = (_glob.glob(os.path.join(path, "*.parquet"))
             if os.path.isdir(path) else [path])
    file_bytes = sum(os.path.getsize(f) for f in files)
    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4
    blocks = max(len(files), cpus,
                 int(np.ceil(file_bytes * 3 / target_block_bytes)))
    return ray.data.read_parquet(path, override_num_blocks=blocks)


def pick_num_buckets(input_bytes: int,
                     target: int = DEFAULT_TARGET_PARTITION_BYTES,
                     min_buckets: int | None = None) -> int:
    """Partition count: ~`target` input bytes per partition, but never
    fewer than the cluster's CPUs so every core gets work even on
    small inputs (at 100 TB the bytes term dominates and partitions
    stay ~128 MiB; measured locally, 1× CPUs beats 2× because each
    extra partition pays a fixed FSST-training cost)."""
    if min_buckets is None:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        min_buckets = max(8, cpus)
    return max(min_buckets, int(np.ceil(input_bytes / target)))


def enable_hash_shuffle(ds):
    """Key-based repartition requires the hash-shuffle backend; the
    context was captured when ``ds`` was created, so set it there.
    Aggregator actors are capped at ~half the CPUs so the exchange can
    never starve map/actor-pool stages (this VM deadlocks at 2 CPUs
    otherwise).  Canonical copy — every keyed repartition in the repo
    goes through here."""
    if hasattr(ds, "context"):
        import ray
        from ray.data.context import ShuffleStrategy
        ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        ds.context.max_hash_shuffle_aggregators = max(1, cpus // 2)
        # Cap the CPU *reservation* of shuffle aggregator actors at
        # ~25% of the cluster per 32-partition exchange.  Ray's default
        # reserves min(1, CPU/2/parts) per partition, so two PIPELINED
        # keyed repartitions (e.g. the dedup pair pipeline: gram
        # exchange → pair exchange) reserve 100% of a small cluster's
        # CPUs for actors and the map tasks in between starve — a hard
        # deadlock at ≤4 CPUs.  The reservation is a scheduling hint,
        # not a throughput limit.
        ds.context.hash_shuffle_operator_actor_num_cpus_per_partition_override = \
            min(1.0, (cpus / 4) / 32)
    return ds


def encode_pipeline(ds, out_dir: str, num_buckets: int | None = None,
                    key: str = "url", allowed: list | None = None,
                    resume: bool = True, concurrency=None,
                    shuffle_compression: str | None = None,
                    exchange: str = "storage", zstd_level: int = 9):
    """Run the flagship encode; returns the manifests Dataset (small).

    Shape: stateless bucket-id map → ONE url-keyed exchange (bucket =
    fnv1a(url) % P is a pure function of the data, so resume
    reproduces membership) → bounded encode stage that persists one
    sorted, encoded, manifest-covered Parquet per bucket.

    ``exchange`` picks the all-to-all backend:

    - ``"storage"`` (default): map tasks spill one zstd'd Arrow IPC
      file per (block, bucket) straight to the output store's
      ``_shuffle/`` directory and each reduce task lists only its own
      bucket directory — the external-shuffle-service pattern (Spark
      shuffle files / Magnet / cloud shuffle storage).  Measured here:
      70→102 MB/s at 4→16 CPUs vs 54→61 for the object-store path,
      because it sidesteps Ray's per-block aggregator/IPC overheads;
      spills are retry-safe (per-attempt unique names; reducers read
      only the materialized spill manifest's files, atomic rename)
      and there is NO driver-side path state.  Multi-node
      needs `out_dir` on shared storage — true for the encoded output
      anyway at 10^12-doc scale.
    - ``"object_store"``: Ray Data's hash repartition.  The in-memory
      path when output storage is not shared or the cluster's
      object-store fabric outruns its filesystem.
      ``shuffle_compression="zstd"`` additionally packs each block's
      per-bucket rows into zstd'd IPC blobs before the exchange
      (:func:`pack_buckets`) — the right setting when the exchange
      crosses a NETWORK; measured ~10% slower on this single node
      where plasma transfers are memcpy-speed (A/B in BASELINE.md).

    Both backends produce byte-identical stores (parity-tested).
    """
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "_meta.json")
    if resume and os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        # bucket membership is a pure function of (key, num_buckets,
        # hash scheme): a resumed run MUST reuse the original partition
        # count AND the original hash or completed-partition membership
        # silently diverges
        _check_bucket_hash(prev, f"resume({out_dir})")
        if num_buckets is None:
            num_buckets = int(prev["num_buckets"])
    if num_buckets is None:
        num_buckets = pick_num_buckets(ds.size_bytes() or 0)
    tmp_meta = f"{meta_path}.{os.getpid()}.tmp"
    with open(tmp_meta, "w") as f:
        json.dump({"num_buckets": int(num_buckets), "key": key,
                   "bucket_hash": BUCKET_HASH_ID}, f)
    os.replace(tmp_meta, meta_path)
    if concurrency is None:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        concurrency = (1, max(2, cpus))
    if exchange == "storage":
        import shutil

        import ray.data

        shuffle_dir = os.path.join(out_dir, "_shuffle")
        # stale spills from an INTERRUPTED earlier run would sit in
        # the same directories — reducers only read THIS run's spill
        # manifest so they'd merely leak, but start clean anyway;
        # completed partitions still skip via their manifests
        shutil.rmtree(shuffle_dir, ignore_errors=True)
        # barrier by design: every spill must exist before any bucket
        # reduces (the manifest Dataset holds metadata rows only — the
        # shuffled bytes live in the spill files)
        spill_meta = ds.map_batches(
            spill_buckets, batch_format="pyarrow",
            fn_kwargs={"num_buckets": num_buckets,
                       "shuffle_dir": shuffle_dir,
                       "key": key}).materialize()

        # per-part file lists from the MATERIALIZED spill manifest:
        # reducers read exactly these files, so orphan spills from a
        # failed/retried map attempt (names are per-attempt unique now)
        # are never consumed, and the lists flow as a metadata Dataset
        # — no driver-side path state.  repartition spreads one part
        # per block so batch_size=1 below still yields one reduce task
        # per bucket.
        def _part_files(g: pa.Table) -> pa.Table:
            import json as _json
            return pa.table({
                "part": pa.array([int(g.column("part")[0].as_py())],
                                 pa.int64()),
                "files": pa.array([_json.dumps(sorted(
                    g.column("file").to_pylist()))])})

        parts = (spill_meta.groupby("part")
                 .map_groups(_part_files, batch_format="pyarrow")
                 .repartition(num_buckets))

        # task pool, not actor pool: reducers carry no cross-batch
        # state and a lazily-scaled actor pool serializes the first
        # task wave behind actor startup
        def _reduce(batch: pa.Table) -> pa.Table:
            return StorageBucketEncoder(
                out_dir=out_dir, shuffle_dir=shuffle_dir, sort_key=key,
                allowed=allowed, resume=resume,
                zstd_level=zstd_level)(batch)

        return parts.map_batches(_reduce, batch_format="pyarrow",
                                 batch_size=1)
    enable_hash_shuffle(ds)
    mapper = pack_buckets if shuffle_compression else add_bucket
    return (ds
            .map_batches(mapper, batch_format="pyarrow",
                         fn_kwargs={"num_buckets": num_buckets,
                                    "key": key})
            .repartition(num_blocks=num_buckets, keys=["_bucket"])
            .map_batches(BucketEncoder, batch_format="pyarrow",
                         batch_size=None, concurrency=concurrency,
                         fn_constructor_kwargs={
                             "out_dir": out_dir, "sort_key": key,
                             "allowed": allowed, "resume": resume,
                             "zstd_level": zstd_level}))


def decode_pipeline(out_dir: str, columns: list | None = None):
    """Stream the encoded partitions back to original rows.

    ``columns`` prunes at the READ: each stored column is its own
    Parquet row group, so a filter on the segment's ``column`` field
    skips the html/text payload bytes entirely — a 2-column decode of
    a 5-column store reads ~the 2 columns' bytes, not the file."""
    import ray.data

    files = mf.list_partition_files(out_dir)

    def _decode(batch: pa.Table) -> pa.Table:
        tables = [decode_segment(_read_segment(p, columns), columns)
                  for p in batch.column("path").to_pylist()]
        return pa.concat_tables(tables)

    return (ray.data.from_items([{"path": p} for p in files])
            .map_batches(_decode, batch_format="pyarrow", batch_size=1))


def _read_segment(path: str, columns: list | None) -> pa.Table:
    """Column-pruned segment read: pick row groups directly from the
    file metadata (each encoded column is its own row group; the
    `column` field's min==max statistic names it exactly), which costs
    one metadata parse instead of the dataset-API filter machinery —
    tens of ms per file at scan fan-out."""
    if columns is None:
        return pq.read_table(path)
    want = set(columns)
    pf = pq.ParquetFile(path)
    md = pf.metadata
    col_idx = md.schema.names.index("column") \
        if "column" in md.schema.names else 0
    keep = []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(col_idx).statistics
        if st is None or st.min is None or st.min != st.max:
            keep = None   # stats unusable → read everything
            break
        if st.min in want:
            keep.append(g)
    if keep is None:
        return pq.read_table(path)
    if not keep:
        # preserve schema metadata for empty-subset decode
        return pf.schema_arrow.empty_table()
    return pf.read_row_groups(keep)


def lookup(out_dir: str, values: list, columns: list | None = None
           ) -> pa.Table:
    """Point lookup by sort key with partition AND column pruning.

    The bucket id is a pure function of the key (`add_bucket`), so the
    owning partition of each key is computed directly — no index, no
    scan: |distinct buckets| segment files are opened out of the whole
    store, and within each file only the requested columns' row groups
    are read.  Driver-side by design: point lookups touch KBs; at
    10^12-doc scale this is the client read path the per-partition
    manifests + deterministic bucketing exist to make O(keys), while
    full-table work goes through :func:`decode_pipeline`.
    """
    meta_path = os.path.join(out_dir, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        _check_bucket_hash(meta, f"lookup({out_dir})")
        num_buckets, key = int(meta["num_buckets"]), meta["key"]
    else:
        # A store without _meta.json predates the bucket-hash stamp —
        # it may have been written under a DIFFERENT hash (round-1
        # stores used crc32), in which case recomputed buckets silently
        # miss keys.  Fail loudly instead of guessing.
        raise ValueError(
            f"lookup({out_dir}): store has no _meta.json, so its "
            "bucket hash cannot be verified (pre-stamp stores may use "
            "a different hash and lookups would silently miss) — "
            "re-encode from source data (run_pipeline.py encode) to "
            "stamp the layout contract; recompress preserves the "
            "original, unverifiable membership")
    import pyarrow.compute as pc
    probe = pa.table({key: pa.array(values)})
    buckets = add_bucket(probe, num_buckets, key).column("_bucket")
    need = (None if columns is None
            else sorted(set(columns) | {key}))
    out = []
    for part in sorted(set(buckets.to_pylist())):
        data_path, _ = mf.partition_paths(out_dir, part)
        if not os.path.exists(data_path):
            continue
        tbl = decode_segment(_read_segment(data_path, need), need)
        mask = pc.is_in(tbl.column(key),
                        value_set=probe.column(key).cast(
                            tbl.schema.field(key).type))
        out.append(tbl.filter(mask))
    if out:
        return pa.concat_tables(out)
    # no partition held any requested key: empty table, right schema
    files = mf.list_partition_files(out_dir)
    if not files:
        raise FileNotFoundError(f"no partitions under {out_dir}")
    seg = _read_segment(files[0], need)
    return decode_segment(seg, need).schema.empty_table()


def recompress_pipeline(src_dir: str, out_dir: str,
                        allowed: list | None = None, resume: bool = True):
    """Codec migration: re-encode an existing store with the CURRENT
    codec set (e.g. after new codecs land), partition-parallel with
    ZERO shuffle — bucket membership and sort order are properties of
    the stored partitions, so each one decodes, re-selects codecs and
    rewrites independently; `_meta.json` carries over and completed
    output partitions are skipped on resume.  Returns the manifests
    Dataset (same shape as :func:`encode_pipeline`)."""
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    src_meta = os.path.join(src_dir, "_meta.json")
    if os.path.exists(src_meta):
        with open(src_meta) as f:
            meta = json.load(f)
    else:
        meta = {"num_buckets": None, "key": "url"}
    tmp_meta = f"{os.path.join(out_dir, '_meta.json')}.{os.getpid()}.tmp"
    with open(tmp_meta, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_meta, os.path.join(out_dir, "_meta.json"))
    key = meta.get("key", "url")

    files = mf.list_partition_files(src_dir)

    def _recode(batch: pa.Table) -> pa.Table:
        payloads = []
        for p in batch.column("path").to_pylist():
            part = mf.partition_id(p)
            data_path, man_path = mf.partition_paths(out_dir, part)
            group = decode_segment(pq.read_table(p))
            if resume:
                done = mf.completed_partition(out_dir, part)
                if done is not None and done.get("rows") == group.num_rows:
                    done = dict(done)
                    done["skipped"] = True
                    payloads.append(done)
                    continue
            t0 = time.perf_counter()
            seg, choices = encode_table(group, allowed)
            enc_bytes = int(sum(len(b) for row in
                                seg.column("buffers").to_pylist()
                                for b in row))
            tmp = data_path + ".tmp"
            pq.write_table(seg, tmp, compression="zstd",
                           compression_level=9, row_group_size=1)
            os.replace(tmp, data_path)
            payload = {
                "part": part,
                "rows": group.num_rows,
                "input_bytes": int(group.nbytes),
                "encoded_bytes": enc_bytes,
                "data_size": os.path.getsize(data_path),
                "codecs": choices,
                "sort_key": key,
                "key_digest": mf.column_digest(group.column(key))
                if key in group.column_names else "",
                "encode_sec": round(time.perf_counter() - t0, 4),
                "file": os.path.basename(data_path),
                "skipped": False,
            }
            mf.write_manifest(man_path, payload)
            payloads.append(payload)
        return _manifest_rows(payloads)

    return (ray.data.from_items([{"path": p} for p in files])
            .map_batches(_recode, batch_format="pyarrow", batch_size=1))


VERIFY_SCHEMA = pa.schema([
    pa.field("part", pa.int64()),
    pa.field("rows_ok", pa.bool_()),
    pa.field("digest_ok", pa.bool_()),
    pa.field("rows", pa.int64()),
])


def verify_store(out_dir: str):
    """Integrity check of an encoded store: decode every partition and
    compare (row count, sort-key digest) against its lineage manifest —
    one Ray task per partition, so a 10^12-doc store verifies with the
    same parallelism it encoded with.  Returns a Dataset with one
    verdict row per partition."""
    import ray.data

    files = mf.list_partition_files(out_dir)

    def _verify(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("path").to_pylist():
            part = mf.partition_id(p)
            man = mf.read_manifest(
                mf.partition_paths(out_dir, part)[1]) or {}
            tbl = decode_segment(pq.read_table(p))
            key = man.get("sort_key", "url")
            dig = (mf.column_digest(tbl.column(key))
                   if key in tbl.column_names else "")
            out.append({
                "part": part,
                "rows_ok": tbl.num_rows == man.get("rows"),
                "digest_ok": dig == man.get("key_digest"),
                "rows": tbl.num_rows,
            })
        return pa.Table.from_pylist(out, schema=VERIFY_SCHEMA)

    return (ray.data.from_items([{"path": p} for p in files])
            .map_batches(_verify, batch_format="pyarrow", batch_size=1))


DECODE_METRICS_SCHEMA = pa.schema([
    pa.field("part", pa.int64()),
    pa.field("rows", pa.int64()),
    pa.field("decoded_bytes", pa.int64()),
    pa.field("decode_sec", pa.float64()),
    pa.field("decode_mbps", pa.float64()),
])


def decode_metrics_pipeline(out_dir: str):
    """Per-partition decode throughput metrics (north rule:
    "per-partition encode/decode throughput and compression-ratio
    metrics" — encode-side figures live in each partition's lineage
    manifest): decode every partition and emit one metrics row per
    partition instead of the decoded rows."""
    import ray.data

    files = mf.list_partition_files(out_dir)

    def _metrics(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("path").to_pylist():
            t0 = time.perf_counter()
            tbl = decode_segment(pq.read_table(p))
            dt = time.perf_counter() - t0
            part = mf.partition_id(p)
            out.append({
                "part": part,
                "rows": tbl.num_rows,
                "decoded_bytes": int(tbl.nbytes),
                "decode_sec": round(dt, 4),
                "decode_mbps": round(tbl.nbytes / dt / 1e6, 2)
                if dt > 0 else 0.0,
            })
        return pa.Table.from_pylist(out, schema=DECODE_METRICS_SCHEMA)

    return (ray.data.from_items([{"path": p} for p in files])
            .map_batches(_metrics, batch_format="pyarrow", batch_size=1))


def summarize(manifests) -> dict:
    """Collapse the manifest Dataset into headline metrics (small)."""
    t = manifests.to_pandas()
    total_in = int(t["input_bytes"].sum())
    total_data = int(t["data_size"].sum())
    return {
        "partitions": int(len(t)),
        "rows": int(t["rows"].sum()),
        "input_bytes": total_in,
        "encoded_bytes": int(t["encoded_bytes"].sum()),
        "stored_bytes": total_data,
        "compression_ratio": round(total_in / total_data, 3)
        if total_data else None,
        "skipped_partitions": int(t["skipped"].sum()),
    }
