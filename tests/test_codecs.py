"""Codec round-trip tests: decode(encode(col)) must be bit-identical
(`pa.Array.equals` + exact type), including nulls, empty strings and
escape-heavy binaries — the carry-over of the reference's golden
round-trip discipline (SURVEY.md §5, FIXTURES.md assertion style).
No Ray needed: codecs are pure Arrow/NumPy kernels.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_producers_ray import codecs
from parquet_producers_ray.codecs import CODECS, Encoded, encode_auto
from parquet_producers_ray.codecs import fsst
from parquet_producers_ray.codecs.base import (arrays_bit_identical,
                                               pack_ints, unpack_ints)

FIXTURE_ARRAYS = {
    "lang_skewed": pa.array((["en"] * 70 + ["fr"] * 20 + ["de", None] * 5) * 20),
    "sorted_keys": pa.array(sorted(["k%03d" % (i // 50) for i in range(2000)])),
    "small_ints": pa.array([5, 7, 7, None, 12, 3, 5, 7] * 50, type=pa.int32()),
    "big_ints": pa.array([2**40 + i for i in range(100)], type=pa.int64()),
    "uint64_high": pa.array([0, 2**63 + 5, 17, 2**64 - 1], type=pa.uint64()),
    "neg_ints": pa.array([-(2**35), -1, None, 8, 3] * 20, type=pa.int64()),
    "timestamps": pa.array(
        np.arange(1_700_000_000_000_000, 1_700_000_000_050_000, 250).tolist(),
        type=pa.timestamp("us")),
    "date32": pa.array([19000 + i % 30 for i in range(200)], type=pa.date32()),
    "floats": pa.array([1.5, float("nan"), None, 2.5, 1.5] * 30),
    "bools": pa.array([True, True, False, None] * 25),
    "text": pa.array(["the quick brown fox %d" % i for i in range(300)]),
    "large_text": pa.array(["payload " * i for i in range(100)],
                           type=pa.large_string()),
    "binary_escape": pa.array([b"\xff" * k for k in range(20)] +
                              [b"\xff\x00\xff", None, b""],
                              type=pa.large_binary()),
    "binary_small": pa.array([b"<html><body>hi</body></html>", b"", None] * 40,
                             type=pa.binary()),
    "empty_str": pa.array([], type=pa.string()),
    "empty_int": pa.array([], type=pa.int64()),
    "all_null_int": pa.array([None] * 17, type=pa.int32()),
    "all_null_str": pa.array([None] * 17, type=pa.string()),
    "single": pa.array(["x"]),
    "constant": pa.array([42] * 1000, type=pa.int16()),
    "floats_dense": pa.array(
        (np.sin(np.arange(2000)) * 100).astype(np.float64)),
    "floats16": pa.array(np.arange(100, dtype=np.float16),
                         type=pa.float16()),
    "embedding_list": pa.array(
        np.random.default_rng(11).standard_normal((200, 16))
        .astype(np.float32).tolist(), type=pa.list_(pa.float32())),
    "embedding_fsl": pa.FixedSizeListArray.from_arrays(
        pa.array(np.random.default_rng(12).standard_normal(800)
                 .astype(np.float32)), 8),
    "ragged_float_list": pa.array(
        [[float(i)] * (i % 5) for i in range(300)],
        type=pa.list_(pa.float64())),
}


@pytest.mark.parametrize("colname", list(FIXTURE_ARRAYS))
@pytest.mark.parametrize("codec_name", list(CODECS))
def test_roundtrip_bit_identity(colname, codec_name):
    arr = FIXTURE_ARRAYS[colname]
    codec = CODECS[codec_name]
    if not codec.applicable(arr.type):
        pytest.skip("not applicable")
    try:
        enc = codec.encode(arr)
    except ValueError:
        pytest.skip("declined input (e.g. negative for bitpack)")
    dec = codecs.decode(enc)
    assert dec.type == arr.type
    assert arrays_bit_identical(dec, arr), \
        f"{codec_name} round-trip mismatch on {colname}"


@pytest.mark.parametrize("colname", list(FIXTURE_ARRAYS))
def test_auto_roundtrip(colname):
    arr = FIXTURE_ARRAYS[colname]
    enc = encode_auto(arr)
    dec = codecs.decode(enc)
    assert arrays_bit_identical(dec, arr)


def test_auto_picks_sensible_codecs():
    assert encode_auto(FIXTURE_ARRAYS["lang_skewed"]).codec in ("dict", "rle")
    # selection metric is POST-zstd stored bytes (segment files are
    # zstd Parquet): front-coded duplicate keys beat RLE there, and
    # both beat everything else
    assert encode_auto(FIXTURE_ARRAYS["sorted_keys"]).codec in ("rle",
                                                                "prefix")
    # evenly-spaced sorted timestamps: delta (tiny increments) beats
    # frame-of-reference (wide range)
    assert encode_auto(FIXTURE_ARRAYS["timestamps"]).codec == "delta"
    assert encode_auto(FIXTURE_ARRAYS["big_ints"]).codec == "delta"
    # sorted url-shaped strings: front coding wins over FSST/plain
    urls = pa.array(sorted("https://www.example%d.com/p/%d.html"
                           % (i % 37, i) for i in range(20000)))
    assert encode_auto(urls).codec == "prefix"


def test_prefix_beats_fsst_stored_on_sorted_urls():
    # the reason the codec exists: url-sorted partitions (the flagship
    # sort key) front-code far below FSST, measured at what the store
    # pays (post-zstd)
    from parquet_producers_ray.codecs import fsst, prefix
    from parquet_producers_ray.codecs.auto import stored_size
    urls = pa.array(sorted("https://www.example%d.com/p/%d/x%d.html"
                           % (i % 53, i // 53, i) for i in range(20000)))
    assert stored_size(prefix.encode(urls)) < stored_size(fsst.encode(urls))


def test_bss_beats_plain_on_floats_and_embeddings():
    # the byte-plane transpose + deflate must realise the exponent/sign
    # redundancy real float data carries; plain IPC cannot
    from parquet_producers_ray.codecs import plain
    for name in ("floats_dense", "embedding_list", "embedding_fsl"):
        arr = FIXTURE_ARRAYS[name]
        b = CODECS["bss"].encode(arr)
        assert b.nbytes < plain.encode(arr).nbytes, name
        dec = codecs.decode(b)
        assert dec.type == arr.type and arrays_bit_identical(dec, arr)
    # auto-selection routes dense float/embedding columns to bss
    assert encode_auto(FIXTURE_ARRAYS["embedding_list"]).codec == "bss"


def test_bss_declines_nulls_auto_falls_back():
    nl = pa.array([[1.0, 2.0], None], pa.list_(pa.float32()))
    with pytest.raises(ValueError):
        CODECS["bss"].encode(nl)
    enc = encode_auto(nl)
    assert arrays_bit_identical(codecs.decode(enc), nl)


def test_delta_beats_for_on_sorted_wide_range():
    arr = pa.array(np.cumsum(np.random.default_rng(3).integers(
        0, 50, 50_000)) + 2**45, type=pa.int64())
    d = CODECS["delta"].encode(arr)
    f = CODECS["for"].encode(arr)
    assert d.nbytes < f.nbytes / 2.5   # 7-bit deltas vs 21-bit offsets
    assert arrays_bit_identical(codecs.decode(d), arr)


def test_encoded_row_roundtrip():
    enc = encode_auto(FIXTURE_ARRAYS["text"])
    row = enc.to_row("text")
    enc2 = Encoded.from_row(row)
    assert codecs.decode(enc2).equals(FIXTURE_ARRAYS["text"])


def test_compression_beats_plain_on_friendly_data():
    for name in ("lang_skewed", "sorted_keys", "timestamps", "constant"):
        arr = FIXTURE_ARRAYS[name]
        plain_size = CODECS["plain"].encode(arr).nbytes
        auto_size = encode_auto(arr).nbytes
        assert auto_size < plain_size, name


@pytest.mark.parametrize("width", [0, 1, 5, 8, 13, 32, 63, 64])
def test_pack_ints_roundtrip(width):
    rng = np.random.default_rng(42)
    if width == 0:
        vals = np.zeros(100, dtype=np.uint64)
    elif width == 64:
        vals = rng.integers(0, 2**63, 100, dtype=np.uint64) * 2 + 1
    else:
        vals = rng.integers(0, 2**width, 100, dtype=np.uint64)
    buf = pack_ints(vals, width)
    out = unpack_ints(buf, width, len(vals))
    assert np.array_equal(out, vals)


def test_fsst_on_unique_texts_beats_plain():
    # token soup from a small vocabulary — the FIXTURES.md F-1 `text` shape
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta"]
    texts = [" ".join(rng.choice(vocab, 40)) + f" #{i}" for i in range(500)]
    arr = pa.array(texts)
    enc = fsst.encode(arr)
    dec = codecs.decode(enc)
    assert dec.equals(arr)
    assert enc.nbytes < CODECS["plain"].encode(arr).nbytes * 0.6


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=40)), max_size=80))
def test_fsst_hypothesis_binary(vals):
    arr = pa.array(vals, type=pa.large_binary())
    enc = fsst.encode(arr)
    assert codecs.decode(enc).equals(arr)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.integers(-2**60, 2**60)), max_size=80))
def test_int_codecs_hypothesis(vals):
    arr = pa.array(vals, type=pa.int64())
    for name in ("rle", "dict", "for", "delta", "plain"):
        enc = CODECS[name].encode(arr)
        assert codecs.decode(enc).equals(arr), name
    assert codecs.decode(encode_auto(arr)).equals(arr)


def test_fsst_native_and_numpy_paths_agree(monkeypatch):
    """The cc-compiled kernel and the pure-NumPy fallback must both
    round-trip bit-identically (tokenizations may differ; decoded bytes
    may not)."""
    from parquet_producers_ray.codecs import _native
    rng = np.random.default_rng(11)
    vocab = ["<div>", "</div>", "padding", "x", "longtoken"]
    vals = ["".join(rng.choice(vocab, rng.integers(0, 60)))
            for _ in range(200)] + ["", None, "\xff\x00"]
    arr = pa.array(vals, type=pa.string())

    enc_native = fsst.encode(arr)
    assert codecs.decode(enc_native).equals(arr)

    monkeypatch.setattr(_native, "available", lambda: False)
    enc_np = fsst.encode(arr)
    assert codecs.decode(enc_np).equals(arr)
    # numpy decode of the native encoding and vice versa
    monkeypatch.undo()
    assert codecs.decode(enc_np).equals(arr)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(width=32, allow_nan=True, allow_infinity=True),
                max_size=120))
def test_bss_flat_float32_property(vals):
    arr = pa.array(np.array(vals, dtype=np.float32), type=pa.float32())
    enc = CODECS["bss"].encode(arr)
    dec = codecs.decode(enc)
    assert dec.type == arr.type
    assert arrays_bit_identical(dec, arr)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.floats(width=32, allow_nan=True,
                                   allow_infinity=True), max_size=9),
                max_size=40))
def test_bss_float_list_property(rows):
    arr = pa.array([np.array(r, dtype=np.float32).tolist() for r in rows],
                   type=pa.list_(pa.float32()))
    enc = CODECS["bss"].encode(arr)
    dec = codecs.decode(enc)
    assert dec.type == arr.type
    assert arrays_bit_identical(dec, arr)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(width=64, allow_nan=True, allow_infinity=True),
                max_size=150))
def test_xor_flat_float_property(vals):
    """Gorilla-style XOR is pure bit ops: every IEEE value (NaN
    payloads, signed zeros, infinities, subnormals) must round-trip
    bit-identically."""
    arr = pa.array(np.array(vals, dtype=np.float64), type=pa.float64())
    enc = CODECS["xor"].encode(arr)
    dec = codecs.decode(enc)
    assert dec.type == arr.type
    assert arrays_bit_identical(dec, arr)


def test_xor_wins_on_repeat_heavy_series():
    """The codec's target shape: runs of identical / slowly-drifting
    readings (sensor gauges).  XOR deltas are zero or narrow there, so
    it must beat both plane-split (bss) and plain post-zstd — and the
    auto-selector must therefore pick it."""
    from parquet_producers_ray.codecs.auto import stored_size

    rng = np.random.default_rng(5)
    gauge = np.repeat(rng.normal(50.0, 3.0, 40), 100)
    arr = pa.array(gauge, type=pa.float64())
    x = stored_size(CODECS["xor"].encode(arr))
    assert x < stored_size(CODECS["bss"].encode(arr))
    assert x < stored_size(CODECS["plain"].encode(arr))
    assert encode_auto(arr).codec == "xor"


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=60)), max_size=80))
def test_prefix_hypothesis_binary(vals):
    from parquet_producers_ray.codecs import prefix
    arr = pa.array(vals, type=pa.large_binary())
    enc = prefix.encode(arr)
    assert arrays_bit_identical(codecs.decode(enc), arr)


def test_prefix_native_and_numpy_paths_agree(monkeypatch):
    """cc kernel and NumPy fallback cross-decode each other's output
    bit-identically (the fallback is the portable oracle)."""
    from parquet_producers_ray.codecs import _native, prefix
    rng = np.random.default_rng(7)
    hosts = [f"https://h{i}.example/p/" for i in range(9)]
    vals = sorted(hosts[int(rng.integers(0, 9))] + "x" * int(rng.integers(0, 30))
                  + str(i) for i in range(500))
    arr = pa.array(vals + ["", None], type=pa.string())
    enc_native = prefix.encode(arr)
    monkeypatch.setattr(_native, "_LIB", None)
    monkeypatch.setattr(_native, "_TRIED", True)
    enc_numpy = prefix.encode(arr)
    # numpy decode of native encode
    assert arrays_bit_identical(prefix.decode(enc_native), arr)
    monkeypatch.setattr(_native, "_TRIED", False)
    monkeypatch.setattr(_native, "_LIB", None)
    # native decode of numpy encode
    assert arrays_bit_identical(prefix.decode(enc_numpy), arr)


def test_alp_decimal_columns():
    """ALP rescales decimal-like floats to ints exactly (prices/rates);
    non-decimal columns decline and NaN/-0.0 ride the patch list."""
    from parquet_producers_ray.codecs import alp
    from parquet_producers_ray.codecs.auto import stored_size
    rng = np.random.default_rng(9)
    prices = pa.array(np.round(rng.uniform(900.0, 105000.0, 20000), 2))
    enc = alp.encode(prices)
    assert enc.meta["e"] == 2 and enc.meta["np"] == 0
    assert arrays_bit_identical(codecs.decode(enc), prices)
    assert stored_size(enc) < stored_size(CODECS["plain"].encode(prices))
    assert encode_auto(prices).codec == "alp"
    # sprinkle of NaN / inf / -0.0: all patched, still bit-identical
    vals = np.round(rng.uniform(0, 10, 1000), 2)
    vals[::97] = np.nan
    vals[1::97] = np.inf
    vals[2::97] = -0.0
    arr = pa.array(vals)
    enc2 = alp.encode(arr)
    assert enc2.meta["np"] > 0
    assert arrays_bit_identical(codecs.decode(enc2), arr)
    # true continuous floats: declines, auto falls through to bss/plain
    with pytest.raises(ValueError):
        alp.encode(pa.array(rng.standard_normal(500)))
