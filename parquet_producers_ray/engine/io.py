"""Versioned persistent streams (reference ``IPersistentStreams``,
IPersistentStreams.cs:10-17; file layout after
TestCommand/PersistentStreams.cs:7-8).

Every producer stage persists a triple per version — ``content``,
``key_mappings``, ``updates`` — plus a JSON state blob (run timings,
row counts, surrogate-id counter).  ``ParquetStore`` lays out
``root/{stage}/v{N}/{kind}/part-*.parquet`` with a ``_state.json``
per stage; a missing version reads as None (reference: missing →
empty stream).  ``MemoryStore`` keeps materialized datasets for tests.
"""

from __future__ import annotations

import json
import os


class MemoryStore:
    def __init__(self):
        self._data: dict = {}
        self._state: dict = {}

    def upload(self, stage: str, kind: str, version: int, ds) -> None:
        self._data[(stage, kind, version)] = ds.materialize()

    def open_read(self, stage: str, kind: str, version: int):
        return self._data.get((stage, kind, version))

    def read_state(self, stage: str) -> dict:
        return dict(self._state.get(stage, {}))

    def write_state(self, stage: str, state: dict) -> None:
        self._state[stage] = dict(state)


class ParquetStore:
    """Partitioned-parquet store: resumable, many files per version so
    reads parallelize; writes go to a temp dir renamed into place so a
    version is visible only when complete."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str, kind: str, version: int) -> str:
        return os.path.join(self.root, stage, f"v{version}", kind)

    def upload(self, stage: str, kind: str, version: int, ds) -> None:
        path = self._dir(stage, kind, version)
        tmp = path + ".tmp"
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)
        os.replace(tmp, path)

    def open_read(self, stage: str, kind: str, version: int):
        import ray.data
        path = self._dir(stage, kind, version)
        if not os.path.isdir(path):
            return None
        return ray.data.read_parquet(path)

    def _state_path(self, stage: str) -> str:
        return os.path.join(self.root, stage, "_state.json")

    def read_state(self, stage: str) -> dict:
        try:
            with open(self._state_path(stage)) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def write_state(self, stage: str, state: dict) -> None:
        os.makedirs(os.path.dirname(self._state_path(stage)), exist_ok=True)
        tmp = self._state_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
        os.replace(tmp, self._state_path(stage))
