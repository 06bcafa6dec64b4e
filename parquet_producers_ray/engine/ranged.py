"""Range-partitioned versioned tables + incremental delta application —
the reference's core cost contract made distributed: "only the delta is
ever sorted; prior state is never re-sorted" (README.md:160-166,
ParquetProduction.cs:52-91).

A ``RangedTable`` is one logical sorted table per version: many Parquet
partition files, each covering a disjoint sort-key range recorded in a
manifest.  Applying a version delta touches ONLY the partitions whose
key ranges intersect the delta:

- delete keys and add rows are assigned to partitions by range bisect
  (driver-side, delta-sized work);
- each touched partition is rewritten by one Ray task (read → drop
  invalidated pairs → merge the delta slice → partition-local sort →
  write v+1 file, splitting when oversized);
- every untouched partition is HARDLINKED into the new version — zero
  bytes moved, zero rows re-sorted;
- reads of "rows with key ∈ K" open only the partitions whose range
  can contain K (the provenance-index lookup never scans the table).

Ordering caveats:
- partition assignment compares keys in a normalized order-preserving
  space (``_norm_value``: timestamps → epoch µs, bytes → hex) that
  agrees with Arrow ordering for integers, timestamps, bytes and ASCII
  strings (the engine's key types);
- the ranged store's canonical PHYSICAL order is ascending: a
  descending-target bootstrap is stored as written (manifest ranges are
  orientation-agnostic, so pruning stays correct), but incremental
  rewrites normalize touched partitions to ascending — descending
  target order is a logical property of the DAG (feeds, surrogate
  allocation order), not a physical guarantee of this store.
"""

from __future__ import annotations

import bisect
import json
import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_TARGET_ROWS = 100_000   # reference RowsPerGroup (an upper CAP)
# Partition granularity is BYTE-aware: fat rows (webpages ~2 KB) would
# make 100k-row partitions ~200 MB each, destroying the hardlink /
# partial-rewrite granularity that makes deltas cheap (a 1 % delta
# would rewrite every partition).  write_full derives an effective
# rows-per-partition from the observed mean row width against this
# byte target, caps it at target_rows, and STAMPS it into the version
# manifest so later deltas/compacts keep the same granularity.
DEFAULT_TARGET_BYTES = 4 << 20


def _norm_value(v):
    """JSON-safe, ORDER-PRESERVING normal form of one key value: the
    manifest min/max and every bisect comparison go through this, so
    timestamps (→ epoch µs int) and bytes (→ hex, order-preserving
    since each byte maps to two hex chars) survive the JSON round-trip
    with correct range semantics.  int/str pass through."""
    import datetime
    if isinstance(v, datetime.datetime):
        return int((v - datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo))
                   .total_seconds() * 1_000_000)
    if isinstance(v, datetime.date):
        return v.toordinal()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _norm_tuple(k) -> tuple:
    return tuple(_norm_value(v) for v in k)


def _key_tuple(batch: pa.Table, cols: list, i: int) -> tuple:
    return tuple(batch.column(c)[i].as_py() for c in cols)


def _file_range(path: str, sort_cols: list) -> tuple:
    """Exact (min,max) sort keys of a file in NORMALIZED-ASCENDING
    tuple space (the space every manifest bisect compares in).

    First/last-row sampling is NOT enough: a bootstrap written with a
    descending target key but ascending tie-break columns (e.g.
    (count DESC, _sk_word ASC)) does not carry its lexicographic max
    at either end — (3,'c') hides between (3,'b') and (1,'a') — and a
    too-narrow range makes drop/lookup pruning silently skip rows.
    Ascending-sort the (narrow) sort-column projection and take its
    endpoints; `_norm_value` is order-preserving per value, so Arrow's
    ascending order IS the normalized-tuple order."""
    pf = pq.ParquetFile(path)
    t = pf.read(columns=sort_cols).sort_by(
        [(c, "ascending") for c in sort_cols])
    lo = _norm_tuple(_key_tuple(t, sort_cols, 0))
    hi = _norm_tuple(_key_tuple(t, sort_cols, len(t) - 1))
    return (lo, hi, pf.metadata.num_rows)


class RangedTable:
    """One versioned, sorted, range-partitioned Parquet table."""

    def __init__(self, root: str, sort_cols: list,
                 target_rows: int = DEFAULT_TARGET_ROWS,
                 target_bytes: int = DEFAULT_TARGET_BYTES):
        self.root = root
        self.sort_cols = list(sort_cols)
        self.target_rows = target_rows
        self.target_bytes = target_bytes
        os.makedirs(root, exist_ok=True)

    def _granularity(self, version: int) -> int:
        """Effective rows-per-partition of an existing version (stamped
        by write_full); falls back to the row cap for stores written
        before byte-aware sizing."""
        m = self.manifest(version)
        if m is not None and m.get("target_rows"):
            return int(m["target_rows"])
        return self.target_rows

    # -- layout -----------------------------------------------------------

    def _vdir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version}")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._vdir(version), "manifest.json")

    def manifest(self, version: int) -> Optional[dict]:
        try:
            with open(self._manifest_path(version)) as f:
                return json.load(f)
        except OSError:
            return None

    def _write_manifest(self, version: int, parts: list,
                        target_rows: int | None = None) -> None:
        parts = sorted(parts, key=lambda p: tuple(p["min"]))
        m = {"sort_cols": self.sort_cols, "partitions": parts,
             "target_rows": int(target_rows or self.target_rows)}
        tmp = self._manifest_path(version) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)   # min/max pre-normalized by _norm_tuple
        os.replace(tmp, self._manifest_path(version))

    def versions(self) -> list:
        """Existing version numbers, ascending (manifest present)."""
        out = []
        for name in os.listdir(self.root):
            if name.startswith("v") and name[1:].isdigit() \
                    and os.path.exists(os.path.join(self.root, name,
                                                    "manifest.json")):
                out.append(int(name[1:]))
        return sorted(out)

    def prune(self, keep_from: int) -> dict:
        """Delete version directories below ``keep_from`` (retention GC
        — the reference keeps every ``{name}.{version}.{type}.parquet``
        forever, ``TestCommand/PersistentStreams.cs:7-28``; a
        long-running mirror needs to reclaim).  Hardlinked partition
        files shared with surviving versions keep their inodes — only
        bytes whose last link dies are actually freed.  The newest
        version is never deleted.  Returns counts + bytes actually
        reclaimed."""
        import shutil

        vs = self.versions()
        if not vs:
            return {"pruned_versions": 0, "freed_bytes": 0}
        keep_from = min(keep_from, vs[-1])   # always keep the newest
        doomed = [v for v in vs if v < keep_from]
        # account by INODE across the whole pruned set: a file
        # hardlink-shared only among pruned versions IS reclaimed once
        # the last of them goes, so its bytes must count exactly once —
        # the old per-file st_nlink == 1 test undercounted those to
        # zero (and a per-version stat order could not see siblings)
        inodes: dict = {}
        for v in doomed:
            vdir = self._vdir(v)
            for fname in os.listdir(vdir):
                st = os.stat(os.path.join(vdir, fname))
                size, nlink, seen = inodes.get(
                    st.st_ino, (st.st_size, st.st_nlink, 0))
                inodes[st.st_ino] = (size, nlink, seen + 1)
        freed = sum(size for size, nlink, seen in inodes.values()
                    if seen >= nlink)   # every remaining link is pruned
        pruned = 0
        for v in doomed:
            shutil.rmtree(self._vdir(v))
            pruned += 1
        return {"pruned_versions": pruned, "freed_bytes": freed}

    # -- bootstrap write --------------------------------------------------

    def write_full(self, ds, version: int) -> None:
        """Distributed write of an (already sorted) Dataset: EXPLICIT
        ~target_rows partitioning (order-preserving repartition; the
        incidental sort-block structure is not a contract — a one-block
        sorted delta would otherwise become one giant partition and
        defeat the hardlink/rewrite granularity), ranges discovered
        from the written files."""
        vdir = self._vdir(version)
        import shutil
        shutil.rmtree(vdir, ignore_errors=True)
        os.makedirs(vdir, exist_ok=True)
        ds = ds.materialize()
        total = ds.count()
        nbytes = ds.size_bytes() or 0
        eff = self.target_rows
        if total and nbytes:
            avg = max(1, nbytes // total)
            eff = int(min(self.target_rows,
                          max(1024, self.target_bytes // avg)))
        nf = max(1, -(-total // eff))
        ds = ds.repartition(nf)          # no shuffle: order-preserving
        ds.write_parquet(vdir, row_group_size=eff)
        parts = []
        for fname in sorted(os.listdir(vdir)):
            if not fname.endswith(".parquet"):
                continue
            path = os.path.join(vdir, fname)
            if pq.ParquetFile(path).metadata.num_rows == 0:
                os.unlink(path)
                continue
            lo, hi, rows = _file_range(path, self.sort_cols)
            parts.append({"file": fname, "rows": rows,
                          "min": list(lo), "max": list(hi)})
        self._write_manifest(version, parts, target_rows=eff)

    # -- reads ------------------------------------------------------------

    def files(self, version: int) -> list:
        m = self.manifest(version)
        if m is None:
            return []
        return [os.path.join(self._vdir(version), p["file"])
                for p in m["partitions"]]

    def read(self, version: int):
        """Whole table as an ordered Dataset."""
        import ray.data
        files = self.files(version)
        if not files:
            return None
        return ray.data.read_parquet(files)

    def read_keys(self, version: int, key_tuples: set) -> pa.Table:
        """Range-pruned point lookup: read only the partitions whose
        range can contain one of the keys; returns matching rows.
        `key_tuples` are prefixes of the sort key (e.g. just sk for a
        (sk, tk)-sorted mapping table)."""
        import pyarrow.compute as pc

        m = self.manifest(version)
        if m is None or not key_tuples:
            return None
        nprefix = len(next(iter(key_tuples)))
        norm_keys = sorted(_norm_tuple(k) for k in key_tuples)
        hit = set()
        for p_idx, p in enumerate(m["partitions"]):
            lo = tuple(p["min"])[:nprefix]
            hi = tuple(p["max"])[:nprefix]
            a = bisect.bisect_left(norm_keys, lo)
            if a < len(norm_keys) and norm_keys[a] <= hi:
                hit.add(p_idx)
        if not hit:
            return None
        tables = []
        pre_cols = self.sort_cols[:nprefix]
        for i in sorted(hit):
            path = os.path.join(self._vdir(version),
                                m["partitions"][i]["file"])
            t = pq.read_table(path)
            if nprefix == 1:
                # vectorized membership on the single prefix column
                vals = pa.array([k[0] for k in key_tuples])
                mask = pc.is_in(t.column(pre_cols[0]).combine_chunks()
                                .cast(vals.type), value_set=vals)
                tables.append(t.filter(mask))
            else:
                # column-wise tuple probe (produce's compound-key
                # membership helper) — not a per-CELL .as_py() loop
                from .produce import _membership_mask
                mask = _membership_mask(t, pre_cols, key_tuples)
                tables.append(t.filter(pa.array(mask)))
        return pa.concat_tables(tables) if tables else None

    def read_range(self, version: int, lo=None, hi=None):
        """Key-RANGE scan with zone-map pruning: the per-partition
        min/max bounds in the version manifest (written at encode time,
        read driver-side with zero data I/O) select only partitions
        whose range intersects [lo, hi]; the residual predicate is then
        applied inside each read task.  `lo`/`hi` are inclusive sort-key
        prefixes (scalars or tuples); None = unbounded.  Returns a Ray
        Dataset over the surviving partitions — at a 10^12-row store a
        narrow range launches O(matching partitions) tasks, not a scan.
        This is the range-partitioned complement of the hash store's
        pure-function point `lookup()` (pipelines/flagship.py)."""
        import ray.data

        m = self.manifest(version)
        if m is None:
            return None
        lo_raw = (lo if isinstance(lo, tuple) else (lo,)) \
            if lo is not None else None
        hi_raw = (hi if isinstance(hi, tuple) else (hi,)) \
            if hi is not None else None
        lo_t = _norm_tuple(lo_raw) if lo_raw is not None else None
        hi_t = _norm_tuple(hi_raw) if hi_raw is not None else None
        files = []
        for p in m["partitions"]:
            npre_lo = len(lo_t) if lo_t is not None else 0
            npre_hi = len(hi_t) if hi_t is not None else 0
            if lo_t is not None and tuple(p["max"])[:npre_lo] < lo_t:
                continue
            if hi_t is not None and tuple(p["min"])[:npre_hi] > hi_t:
                continue
            files.append(os.path.join(self._vdir(version), p["file"]))
        if not files:
            return None
        sort_cols = self.sort_cols

        one_col = (lo_t is None or len(lo_t) == 1) and \
            (hi_t is None or len(hi_t) == 1)

        def residual(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            if lo_t is None and hi_t is None:
                return t
            if one_col:   # vectorized bounds on the leading sort column
                col = t.column(sort_cols[0]).combine_chunks()
                mask = pa.array(np.ones(t.num_rows, dtype=bool))
                if lo_raw is not None:
                    mask = pc.and_(mask, pc.greater_equal(
                        col, pa.scalar(lo_raw[0], col.type)))
                if hi_raw is not None:
                    mask = pc.and_(mask, pc.less_equal(
                        col, pa.scalar(hi_raw[0], col.type)))
                return t.filter(mask)
            keys = [_norm_tuple(_key_tuple(t, sort_cols, j))
                    for j in range(t.num_rows)]
            keep = [(lo_t is None or k[:len(lo_t)] >= lo_t) and
                    (hi_t is None or k[:len(hi_t)] <= hi_t)
                    for k in keys]
            return t.filter(pa.array(keep))

        return ray.data.read_parquet(files).map_batches(
            residual, batch_format="pyarrow")

    def _write_fresh(self, new_version: int, new_vdir: str,
                     adds: pa.Table) -> dict:
        """Delta applied on top of an empty version: the (sorted) adds
        become the new table's partitions."""
        parts = []
        n = len(adds)
        eff = self.target_rows
        if n and adds.nbytes:
            avg = max(1, adds.nbytes // n)
            eff = int(min(self.target_rows,
                          max(1024, self.target_bytes // avg)))
        nfiles = max(1, (n + 2 * eff - 1) // (2 * eff)) if n else 0
        for s in range(nfiles):
            step = (n + nfiles - 1) // nfiles
            sl = adds.slice(s * step, step)
            if len(sl) == 0:
                continue
            fname = f"fresh.d{new_version}-{s}.parquet"
            pq.write_table(sl, os.path.join(new_vdir, fname),
                           row_group_size=eff)
            parts.append({
                "file": fname, "rows": len(sl),
                "min": list(_norm_tuple(
                    [sl.column(c)[0].as_py() for c in self.sort_cols])),
                "max": list(_norm_tuple(
                    [sl.column(c)[-1].as_py() for c in self.sort_cols]))})
        self._write_manifest(new_version, parts, target_rows=eff)
        return {"rewritten": len(parts), "linked": 0}

    def compact(self, version: int, new_version: int) -> dict:
        """Merge runs of adjacent undersized partitions into
        target-row-sized files — the complement of apply_delta's
        oversize SPLIT: delete-heavy waves shrink partitions and,
        uncompacted, per-partition task overheads grow without bound.
        Greedy pack in key order (accumulate while the run holds fewer
        than ``target_rows`` rows), so already-full partitions become
        singleton groups and HARDLINK untouched; merged output is
        sorted and range-disjoint by construction (inputs are adjacent
        and disjoint).  One Ray task per merged group."""
        import shutil

        import ray

        m = self.manifest(version)
        assert m is not None, "compact needs an existing version"
        parts = m["partitions"]
        gran = self._granularity(version)   # byte-aware stamped rows
        old_vdir, new_vdir = self._vdir(version), self._vdir(new_version)
        shutil.rmtree(new_vdir, ignore_errors=True)
        os.makedirs(new_vdir, exist_ok=True)

        groups, cur, cur_rows = [], [], 0
        for p in parts:
            cur.append(p)
            cur_rows += p["rows"]
            if cur_rows >= gran:
                groups.append(cur)
                cur, cur_rows = [], 0
        if cur:
            groups.append(cur)

        @ray.remote
        def merge(paths, out_path, target_rows):
            t = pa.concat_tables([pq.read_table(p) for p in paths])
            pq.write_table(t, out_path, row_group_size=target_rows)
            return len(t)

        new_parts, futures, linked = [], [], 0
        for gi, grp in enumerate(groups):
            if len(grp) == 1:
                p = grp[0]
                src = os.path.join(old_vdir, p["file"])
                dst = os.path.join(new_vdir, p["file"])
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)
                new_parts.append(dict(p))
                linked += 1
                continue
            fname = f"compact.c{new_version}-{gi}.parquet"
            futures.append((gi, grp, fname, merge.remote(
                [os.path.join(old_vdir, p["file"]) for p in grp],
                os.path.join(new_vdir, fname), gran)))
        for gi, grp, fname, fut in futures:
            rows = ray.get(fut)
            new_parts.append({"file": fname, "rows": rows,
                              "min": list(grp[0]["min"]),
                              "max": list(grp[-1]["max"])})
        self._write_manifest(new_version, new_parts, target_rows=gran)
        return {"partitions_before": len(parts),
                "partitions_after": len(new_parts),
                "merged_groups": len(futures), "linked": linked}

    # -- incremental apply --------------------------------------------------

    def apply_delta(self, version: int, new_version: int,
                    adds: pa.Table, drop_keys: set,
                    drop_cols: list) -> dict:
        """Produce version `new_version` from `version` by dropping all
        rows whose `drop_cols` tuple ∈ drop_keys and merging `adds`
        (already carrying final column layout).  Only intersecting
        partitions are rewritten; the rest are hardlinked.  Returns
        stats {"rewritten": n, "linked": n}."""
        import ray

        m = self.manifest(version)
        assert m is not None, "apply_delta needs an existing version"
        old_vdir, new_vdir = self._vdir(version), self._vdir(new_version)
        import shutil
        shutil.rmtree(new_vdir, ignore_errors=True)
        os.makedirs(new_vdir, exist_ok=True)

        adds = adds.sort_by([(c, "ascending") for c in self.sort_cols])
        parts = m["partitions"]
        if not parts:
            # previous version holds zero partitions (everything was
            # deleted, or an empty bootstrap): the adds ARE the table
            return self._write_fresh(new_version, new_vdir, adds)
        # assign add rows + drop keys to partitions (all comparisons in
        # the manifest's normalized key space)
        mins = [tuple(p["min"]) for p in parts]
        n_adds = len(adds)
        add_part = [max(0, bisect.bisect_right(
            mins, _norm_tuple(_key_tuple(adds, self.sort_cols, i))) - 1)
            for i in range(n_adds)]
        touched: dict = {}
        for i, pi in enumerate(add_part):
            touched.setdefault(pi, []).append(i)
        # drop keys are tuples over `drop_cols`, a PREFIX of sort_cols:
        # one merge pass assigns each partition the drops its prefix
        # range covers (a key group straddling a file boundary hits
        # every file whose range contains it); rewrite tasks match on
        # the RAW tuples, only the range pruning is normalized
        drop_by_part: dict = {}
        raw_by_norm = {_norm_tuple(k): tuple(k) for k in drop_keys}
        sorted_drops = sorted(raw_by_norm)
        if sorted_drops:
            npre = len(sorted_drops[0])
            for pi, p in enumerate(parts):
                lo = tuple(p["min"])[:npre]
                hi = tuple(p["max"])[:npre]
                a = bisect.bisect_left(sorted_drops, lo)
                b = bisect.bisect_right(sorted_drops, hi)
                if b > a:
                    drop_by_part.setdefault(pi, set()).update(
                        raw_by_norm[k] for k in sorted_drops[a:b])
        for pi in drop_by_part:
            touched.setdefault(pi, [])

        @ray.remote
        def rewrite(path, add_tbl, drops, drop_cols, sort_cols,
                    target_rows, out_dir, stem):
            t = pq.read_table(path)
            if drops:
                # vectorized membership (pc.is_in / column-wise tuple
                # probe) — the old per-cell .as_py() loop was O(rows ×
                # cols) interpreter work per rewrite task
                from parquet_producers_ray.engine.produce import \
                    _membership_mask
                mask = _membership_mask(t, drop_cols, drops)
                t = t.filter(pa.array(~mask))
            if add_tbl is not None and len(add_tbl):
                t = pa.concat_tables([t, add_tbl.cast(t.schema)])
            t = t.sort_by([(c, "ascending") for c in sort_cols])
            out = []
            nfiles = max(1, (len(t) + 2 * target_rows - 1)
                         // (2 * target_rows)) if len(t) else 0
            for s in range(nfiles):
                sl = t.slice(s * ((len(t) + nfiles - 1) // nfiles),
                             (len(t) + nfiles - 1) // nfiles)
                if len(sl) == 0:
                    continue
                fname = f"{stem}-{s}.parquet"
                pq.write_table(sl, os.path.join(out_dir, fname),
                               row_group_size=target_rows)
                out.append({
                    "file": fname, "rows": len(sl),
                    "min": list(_norm_tuple(
                        [sl.column(c)[0].as_py() for c in sort_cols])),
                    "max": list(_norm_tuple(
                        [sl.column(c)[-1].as_py() for c in sort_cols]))})
            return out

        gran = self._granularity(version)   # byte-aware stamped rows
        futures = []
        for pi, add_rows in touched.items():
            p = parts[pi]
            add_tbl = adds.take(pa.array(add_rows)) if add_rows else None
            futures.append(rewrite.remote(
                os.path.join(old_vdir, p["file"]), add_tbl,
                drop_by_part.get(pi, set()), drop_cols, self.sort_cols,
                gran, new_vdir,
                os.path.splitext(p["file"])[0] + f".d{new_version}"))

        new_parts = []
        for pi, p in enumerate(parts):
            if pi in touched:
                continue
            src = os.path.join(old_vdir, p["file"])
            dst = os.path.join(new_vdir, p["file"])
            try:
                os.link(src, dst)
            except OSError:
                import shutil as _sh
                _sh.copy2(src, dst)
            new_parts.append(dict(p))
        import ray as _ray
        for got in _ray.get(futures):
            new_parts.extend(got)
        new_parts = [p for p in new_parts if p["rows"] > 0]
        self._write_manifest(new_version, new_parts, target_rows=gran)
        return {"rewritten": len(touched),
                "linked": len(parts) - len(touched)}
