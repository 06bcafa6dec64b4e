"""Storage-backed distributed sample sort.

Ray Data's ``ds.sort`` moves every block through the object-store
all-to-all, which on this sandbox (and on any cluster whose
object-store fabric is slower than its storage) is the binding cost of
the engine's wide steps.  This module re-expresses the sort as the
classic sample sort over spill files — the same external-shuffle
pattern the flagship's storage exchange uses (``pipelines/flagship.py::
spill_buckets``), generalized to RANGE partitioning:

1. **Sample** the first sort column (zero-copy ``select_columns`` over
   the, usually already materialized, input) and cut P-1 range bounds;
2. **Spill**: each map task slices its block by ``searchsorted(bounds)``
   and writes one lz4'd Arrow IPC file per touched range under that
   range's own directory — named by the producing BLOCK's ordinal
   (never content-addressed: two blocks can carry byte-identical
   slices — duplicate shards, hot constant keys — and a digest name
   silently drops one via os.replace; see CLAUDE.md spill-naming
   invariant), written via temp-file + atomic rename so a retried
   task overwrites its own file idempotently;
3. **Reduce**: one task per range lists its directory, concatenates and
   fully sorts its slice with the complete multi-column (and
   per-column descending) spec.

Block k of the result holds range k, each block internally sorted, so
the dataset is GLOBALLY sorted (Ray Data preserves block order for map
stages).  Ties on the first column always land in one range, so the
within-range sort settles every secondary column.

Degenerate inputs (few distinct leading values, tiny datasets) fall
back to ``ds.sort`` — correctness never depends on the fast path.

Multi-node: spill_root must be shared storage (same contract as the
flagship's `_shuffle/`); single-node it lives under /tmp.

Reference anchor: the reference's external merge sort
(``Parquet.Producers/Parquet/MergeSorter.cs:8-93`` spooling sorted
in-memory runs to temp Parquet, k-way merged on read) is the same
move — sort via storage, not via memory fabric.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import numpy as np
import pyarrow as pa

SAMPLES_PER_PART = 64
TARGET_RANGE_BYTES = 128 * 1024 * 1024  # ~one reduce task's working set
MAX_PARTITIONS = 4096
# under this the storage path's extra passes can't pay off → ds.sort
SMALL_SORT_BYTES = int(os.environ.get("PPRAY_SMALL_SORT_BYTES",
                                      96 * 1024 * 1024))
# under this even ds.sort's fixed setup dominates → one-task Arrow sort
TINY_SORT_BYTES = int(os.environ.get("PPRAY_TINY_SORT_BYTES",
                                     16 * 1024 * 1024))


def _string_sortkeys(arr: pa.Array) -> np.ndarray:
    """Big-endian uint64 of each string's first <=8 bytes — an
    order-preserving COARSENING: key(a) < key(b) implies a < b, and
    equal keys always land in one range, where the per-range Arrow
    sort settles the full comparison.  cc kernel with a shifted-gather
    NumPy fallback (large fancy-gathers are slow on some hosts)."""
    off_dtype = np.int64 if (pa.types.is_large_string(arr.type)
                             or pa.types.is_large_binary(arr.type)) \
        else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], off_dtype,
                        count=len(arr) + 1 + arr.offset)[arr.offset:]
    off64 = off.astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    from ..codecs import _native
    if _native.available():
        return _native.sortkey8(data, off64)
    n = len(off64) - 1
    starts, lens = off64[:-1], np.minimum(np.diff(off64), 8)
    key = np.zeros(n, np.uint64)
    for j in range(8):
        m = lens > j
        if not m.any():
            break
        b = np.zeros(n, np.uint64)
        b[m] = data[starts[m] + j]
        key |= b << np.uint64(56 - 8 * j)
    return key


def _first_col_values(tbl: pa.Table, col: str) -> np.ndarray | None:
    """Routing values for the range partitioner; None = unsupported
    leading type (caller falls back to ds.sort)."""
    arr = tbl.column(col).combine_chunks()
    if pa.types.is_integer(arr.type) or pa.types.is_temporal(arr.type):
        try:
            return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        except (pa.ArrowInvalid, pa.lib.ArrowNotImplementedError):
            # uint64 >= 2^63, intervals, …: no int64 coarsening —
            # the caller falls back to ds.sort instead of crashing
            return None
    if (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
            or pa.types.is_binary(arr.type)
            or pa.types.is_large_binary(arr.type)):
        return _string_sortkeys(arr)
    return None


def storage_sort(ds, cols: list, descending=None,
                 num_partitions: int | None = None,
                 spill_root: str | None = None):
    """Sort a Dataset by ``cols`` (per-column ``descending`` flags) via
    storage-backed range exchange; returns a globally sorted Dataset.
    """
    import ray
    import ray.data

    if descending is None:
        descending = [False] * len(cols)
    if isinstance(descending, bool):
        descending = [descending] * len(cols)
    sort_spec = [(c, "descending" if d else "ascending")
                 for c, d in zip(cols, descending)]

    first = cols[0]

    # Materialize ONCE: the sample and spill passes both read these
    # blocks zero-copy from the object store — without this, a lazy
    # upstream pipeline would execute twice.  Blocks spill to disk
    # under memory pressure (Ray object spilling), so this holds at
    # scale; it is the same barrier ds.sort's shuffle implies.
    ds = ds.materialize()
    total_bytes = ds.size_bytes() or 0

    # TINY inputs (delta waves in the incremental engine): one block,
    # one Arrow sort task — Ray's distributed sort costs ~1 s of fixed
    # boundary-sampling/shuffle setup that dominates a few-MB sort and
    # was the bulk of the engine showcase queries' wall at toy scale
    if total_bytes < TINY_SORT_BYTES:
        return ds.repartition(1).map_batches(
            lambda b: b.sort_by(sort_spec), batch_format="pyarrow",
            batch_size=None)

    # below this the two extra passes + per-range task overhead cannot
    # beat the object-store sort — small sorts take the direct path
    if total_bytes < SMALL_SORT_BYTES:
        return ds.sort(cols, descending=descending)

    # -- pass 1: sample the leading column ------------------------------
    def sample(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b.select([first])
        step = max(1, n // SAMPLES_PER_PART)
        out = b.select([first]).take(np.arange(0, n, step))
        if b.column(first).null_count > 0:
            # surface a null so the driver's exact null check trips
            out = pa.concat_tables(
                [out, pa.table({first: pa.array(
                    [None], out.column(first).type)})])
        return out

    sample_batches = list(
        ds.select_columns([first]).map_batches(
            sample, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))
    if not sample_batches:
        return ds.sort(cols, descending=descending)
    samples = pa.concat_tables(sample_batches)
    if samples.column(first).null_count > 0:
        # nulls in the routing column: range semantics undefined
        return ds.sort(cols, descending=descending)

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        num_partitions = min(
            MAX_PARTITIONS,
            max(8, cpus, -(-total_bytes // TARGET_RANGE_BYTES)))

    routed = _first_col_values(samples, first)
    if routed is None:
        # float/decimal/nested leading column: no total-order coarsening
        return ds.sort(cols, descending=descending)
    vals = np.sort(routed)
    distinct = np.unique(vals)
    if len(distinct) < 2 * num_partitions:
        # not enough leading-value spread to range-partition usefully
        return ds.sort(cols, descending=descending)
    # P-1 interior bounds at sample quantiles
    idx = (np.arange(1, num_partitions)
           * (len(vals) / num_partitions)).astype(np.int64)
    bounds = vals[idx]
    if any(bounds[i] > bounds[i + 1] for i in range(len(bounds) - 1)):
        # non-monotone bounds (NaN / mixed-type leading values): range
        # partitioning would break global order — take the safe path
        return ds.sort(cols, descending=descending)

    root = spill_root or tempfile.mkdtemp(
        prefix="ppray_sort_", dir=os.environ.get("PPRAY_SPILL_DIR",
                                                 "/tmp"))
    run_tag = uuid.uuid4().hex[:8]
    spill_dir = os.path.join(root, run_tag)
    os.makedirs(spill_dir, exist_ok=True)

    # -- pass 2: spill each block by range ------------------------------
    # Raw Ray tasks over the MATERIALIZED block refs, one per block,
    # with the block ORDINAL in every spill name: a retried task
    # rewrites exactly its own files (blocks are immutable, names are
    # a pure function of (ordinal, slice start)) while two different
    # blocks can never collide — content-digest names did collide when
    # distinct blocks shared identical content (hot-key runs, bulk
    # duplicate rows), silently dropping rows via os.replace.  This is
    # one of the few justified raw-task spots (the Dataset API has no
    # stable per-block ordinal inside map_batches).
    import ray as _ray

    @_ray.remote
    def _spill_block(b: pa.Table, bidx: int) -> int:
        if b.num_rows == 0:
            return 0
        v = _first_col_values(b, first)
        rid = np.searchsorted(bounds, v, side="right")
        order = np.argsort(rid, kind="stable")
        b = b.take(order)
        rid = rid[order]
        cuts = np.flatnonzero(np.diff(rid)) + 1
        starts = np.concatenate(([0], cuts))
        ends = np.concatenate((cuts, [len(b)]))
        opts = pa.ipc.IpcWriteOptions(compression="lz4")
        for s, e in zip(starts, ends):
            r = int(rid[s])
            d = os.path.join(spill_dir, f"r{r:05d}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"b{bidx:06d}_{s}.arrows")
            tmp = f"{path}.{os.getpid()}.tmp"
            sl = b.slice(s, e - s)
            with pa.OSFile(tmp, "wb") as f, \
                    pa.ipc.new_stream(f, sl.schema, options=opts) as w:
                w.write_table(sl)
            os.replace(tmp, path)
        return b.num_rows

    # barrier by design: all spills must exist before ranges reduce
    _ray.get([_spill_block.remote(ref, i)
              for i, ref in enumerate(ds.to_arrow_refs())])

    schema = ds.schema()
    empty = pa.schema([pa.field(n, t) for n, t in
                       zip(schema.names, schema.types)]).empty_table()

    # -- pass 3: per-range merge + full multi-column sort ----------------
    range_order = list(range(num_partitions))
    if descending[0]:
        range_order.reverse()

    def reduce_range(batch: pa.Table) -> pa.Table:
        import glob as _glob
        outs = []
        for r in batch.column("range").to_pylist():
            d = os.path.join(spill_dir, f"r{int(r):05d}")
            files = sorted(_glob.glob(os.path.join(d, "*.arrows")))
            if not files:
                continue
            tabs = []
            for p in files:
                with pa.OSFile(p) as f:
                    tabs.append(pa.ipc.open_stream(f).read_all())
            outs.append(pa.concat_tables(tabs).sort_by(sort_spec))
        if not outs:
            return empty
        return pa.concat_tables(outs)

    # reducers do NOT delete their spills: the returned Dataset is lazy
    # and a consumer may legally execute it more than once.  Spill dirs
    # are reclaimed at process exit (and by explicit cleanup_spills());
    # when WE created the temp root, register the root itself so the
    # mkdtemp wrapper doesn't leak one empty dir per sort
    _SPILL_DIRS.append(spill_dir if spill_root else root)
    # global order of the result = block order of this map stage; the
    # streaming executor only guarantees that under preserve_order
    # (ds.sort's own all-to-all is ordered regardless, but map stages
    # are not).  Datasets capture the DataContext at creation, so set
    # the flag only around from_items — the result and everything
    # chained onto it inherit it; unrelated pipelines don't pay for it.
    ctx = ray.data.DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        out = ray.data.from_items(
            [{"range": r} for r in range_order]).map_batches(
            reduce_range, batch_format="pyarrow", batch_size=1)
    finally:
        ctx.execution_options.preserve_order = prev
    return out


_SPILL_DIRS: list = []


def cleanup_spills() -> None:
    """Remove every spill directory this process's storage sorts
    created.  Call after the sorted Datasets are fully consumed (the
    bench does); also runs automatically at interpreter exit."""
    while _SPILL_DIRS:
        shutil.rmtree(_SPILL_DIRS.pop(), ignore_errors=True)


import atexit  # noqa: E402

atexit.register(cleanup_spills)
