"""Per-partition lineage manifests + checkpoint resume.

Mirrors the reference's run-level fault-tolerance model — versioned
immutable outputs where upload is the last step so a failed run is
simply re-run (``Parquet.Producers/Producer.cs:104-119``,
``TestCommand/PersistentStreams.cs:15-28``) — at partition granularity:
each partition writes its data file then its manifest JSON atomically
(tmp + rename); a resumed run skips partitions whose manifest is
present and consistent.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa


def partition_paths(out_dir: str, part: int) -> tuple[str, str]:
    return (os.path.join(out_dir, f"part-{part:05d}.parquet"),
            os.path.join(out_dir, f"part-{part:05d}.manifest.json"))


def partition_id(data_path: str) -> int:
    """Inverse of :func:`partition_paths` for the data file name —
    the ONE place that knows the ``part-%05d.parquet`` format."""
    name = os.path.basename(data_path)
    assert name.startswith("part-") and name.endswith(".parquet"), name
    return int(name[len("part-"):-len(".parquet")])


def list_partition_files(out_dir: str) -> list:
    """Sorted data-file paths of every completed partition dir entry."""
    return sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir)
        if f.endswith(".parquet"))


def column_digest(arr: pa.Array) -> str:
    """Cheap deterministic digest of a column (order-sensitive)."""
    h = hashlib.sha256()
    for buf in arr.combine_chunks().buffers():
        if buf is not None:
            h.update(buf)
    return h.hexdigest()[:16]


def write_manifest(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, path)


def read_manifest(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def completed_partition(out_dir: str, part: int) -> dict | None:
    """Return the manifest if this partition already completed cleanly."""
    data_path, man_path = partition_paths(out_dir, part)
    man = read_manifest(man_path)
    if man is None or not os.path.exists(data_path):
        return None
    if man.get("data_size") != os.path.getsize(data_path):
        return None
    return man


def list_manifests(out_dir: str) -> list:
    out = []
    if not os.path.isdir(out_dir):
        return out
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".manifest.json"):
            man = read_manifest(os.path.join(out_dir, name))
            if man is not None:
                out.append(man)
    return out
