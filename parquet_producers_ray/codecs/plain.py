"""Plain codec: Arrow IPC passthrough (the always-applicable fallback)."""

from __future__ import annotations

import pyarrow as pa

from .base import Encoded, field_to_bytes, ipc_array, ipc_bytes

NAME = "plain"


def applicable(typ: pa.DataType) -> bool:
    return True


def encode(arr: pa.Array) -> Encoded:
    return Encoded(NAME, len(arr), field_to_bytes(arr.type), {},
                   [ipc_bytes(arr)])


def decode(enc: Encoded) -> pa.Array:
    return ipc_array(enc.buffers[0])
