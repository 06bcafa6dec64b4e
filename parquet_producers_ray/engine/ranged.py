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

Ordering caveat: partition assignment compares keys as Python tuples
while partition-local sorts use Arrow ordering; these agree for
integers, timestamps and ASCII strings (the engine's key types).
"""

from __future__ import annotations

import bisect
import json
import os
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_TARGET_ROWS = 100_000   # reference RowsPerGroup


def _key_tuple(batch: pa.Table, cols: list, i: int) -> tuple:
    return tuple(batch.column(c)[i].as_py() for c in cols)


def _file_range(path: str, sort_cols: list) -> tuple:
    """Exact (min,max) sort keys of a sorted file: first row of the
    first row group + last row of the last (never trusts possibly
    truncated Parquet column statistics)."""
    pf = pq.ParquetFile(path)
    first = pf.read_row_group(0, columns=sort_cols)
    last = pf.read_row_group(pf.metadata.num_row_groups - 1,
                             columns=sort_cols)
    return (_key_tuple(first, sort_cols, 0),
            _key_tuple(last, sort_cols, len(last) - 1),
            pf.metadata.num_rows)


class RangedTable:
    """One versioned, sorted, range-partitioned Parquet table."""

    def __init__(self, root: str, sort_cols: list,
                 target_rows: int = DEFAULT_TARGET_ROWS):
        self.root = root
        self.sort_cols = list(sort_cols)
        self.target_rows = target_rows
        os.makedirs(root, exist_ok=True)

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

    def _write_manifest(self, version: int, parts: list) -> None:
        parts = sorted(parts, key=lambda p: tuple(p["min"]))
        m = {"sort_cols": self.sort_cols, "partitions": parts}
        tmp = self._manifest_path(version) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, default=str)
        os.replace(tmp, self._manifest_path(version))

    # -- bootstrap write --------------------------------------------------

    def write_full(self, ds, version: int) -> None:
        """Distributed write of an (already sorted) Dataset: one file
        per output block via write_parquet, ranges discovered from the
        written files' first/last rows (footer-cheap)."""
        vdir = self._vdir(version)
        import shutil
        shutil.rmtree(vdir, ignore_errors=True)
        os.makedirs(vdir, exist_ok=True)
        ds.write_parquet(vdir, row_group_size=self.target_rows)
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
        self._write_manifest(version, parts)

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

    def _assign(self, manifest: dict, keys: list) -> dict:
        """key tuple → partition index by range bisect (keys between
        partitions attach to the left neighbour; keys before the first
        partition to partition 0)."""
        mins = [tuple(p["min"]) for p in manifest["partitions"]]
        out = {}
        for k in keys:
            i = bisect.bisect_right(mins, tuple(k)) - 1
            out[tuple(k)] = max(0, i)
        return out

    def read_keys(self, version: int, key_tuples: set) -> pa.Table:
        """Range-pruned point lookup: read only the partitions whose
        range can contain one of the keys; returns matching rows.
        `key_tuples` are prefixes of the sort key (e.g. just sk for a
        (sk, tk)-sorted mapping table)."""
        m = self.manifest(version)
        if m is None or not key_tuples:
            return None
        nprefix = len(next(iter(key_tuples)))
        hit = set()
        for p_idx, p in enumerate(m["partitions"]):
            lo = tuple(p["min"])[:nprefix]
            hi = tuple(p["max"])[:nprefix]
            for k in key_tuples:
                if lo <= tuple(k) <= hi:
                    hit.add(p_idx)
                    break
        if not hit:
            return None
        tables = []
        pre_cols = self.sort_cols[:nprefix]
        for i in sorted(hit):
            path = os.path.join(self._vdir(version),
                                m["partitions"][i]["file"])
            t = pq.read_table(path)
            mask = [_key_tuple(t, pre_cols, j) in key_tuples
                    for j in range(len(t))]
            tables.append(t.filter(pa.array(mask)))
        return pa.concat_tables(tables) if tables else None

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
        # assign add rows + drop keys to partitions
        parts = m["partitions"]
        mins = [tuple(p["min"]) for p in parts]
        n_adds = len(adds)
        add_part = [max(0, bisect.bisect_right(
            mins, _key_tuple(adds, self.sort_cols, i)) - 1)
            for i in range(n_adds)]
        touched: dict = {}
        for i, pi in enumerate(add_part):
            touched.setdefault(pi, []).append(i)
        # drop keys are tuples over `drop_cols`, a PREFIX of sort_cols:
        # one merge pass assigns each partition the drops its prefix
        # range covers (a key group straddling a file boundary hits
        # every file whose range contains it)
        drop_by_part: dict = {}
        sorted_drops = sorted(tuple(k) for k in drop_keys)
        if sorted_drops:
            npre = len(sorted_drops[0])
            for pi, p in enumerate(parts):
                lo = tuple(p["min"])[:npre]
                hi = tuple(p["max"])[:npre]
                a = bisect.bisect_left(sorted_drops, lo)
                b = bisect.bisect_right(sorted_drops, hi)
                if b > a:
                    drop_by_part.setdefault(pi, set()).update(
                        sorted_drops[a:b])
        for pi in drop_by_part:
            touched.setdefault(pi, [])

        @ray.remote
        def rewrite(path, add_tbl, drops, drop_cols, sort_cols,
                    target_rows, out_dir, stem):
            t = pq.read_table(path)
            if drops:
                mask = [tuple(t.column(c)[j].as_py() for c in drop_cols)
                        not in drops for j in range(len(t))]
                t = t.filter(pa.array(mask))
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
                    "min": [sl.column(c)[0].as_py() for c in sort_cols],
                    "max": [sl.column(c)[-1].as_py() for c in sort_cols]})
            return out

        futures = []
        for pi, add_rows in touched.items():
            p = parts[pi]
            add_tbl = adds.take(pa.array(add_rows)) if add_rows else None
            futures.append(rewrite.remote(
                os.path.join(old_vdir, p["file"]), add_tbl,
                drop_by_part.get(pi, set()), drop_cols, self.sort_cols,
                self.target_rows, new_vdir,
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
        self._write_manifest(new_version, new_parts)
        return {"rewritten": len(touched),
                "linked": len(parts) - len(touched)}
