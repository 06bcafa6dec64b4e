"""Unit tests for the training-data operator family: text analysis,
dedup (with injected near-duplicates), similarity search, multimodal
plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_producers_ray.functions import dedup, similarity, text
from parquet_producers_ray.stages import multimodal


def test_fnv1a_matches_reference_vectors():
    # FNV-1a 64 published test vectors
    cases = {b"": 0xcbf29ce484222325,
             b"a": 0xaf63dc4c8601ec8c,
             b"foobar": 0x85944171f73967e8}
    arr = pa.array(list(cases), type=pa.binary())
    out = text.fnv1a_hash(arr)
    assert [int(x) for x in out] == list(cases.values())


def test_token_and_quality_counts():
    t = pa.table({"text": pa.array(["the quick fox", "a", ""])})
    tc = text.token_counts(t)
    assert tc.column("n_tokens").to_pylist() == [3, 1, 1]
    q = text.quality_scores(t)
    assert q.column("stopword_ratio").to_pylist()[0] == pytest.approx(1 / 3)


def test_langid_picks_marked_language():
    t = pa.table({"text": pa.array([
        "the cat is on the mat and it is fine",
        "el perro es de la casa y es un gato",
        "xzqv bnm pqr stu"])})
    out = text.langid_scores(t)
    assert out.column("lang_pred").to_pylist() == ["en", "es", "und"]


def test_minhash_similar_docs_share_bands():
    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base.replace("lazy", "sleepy")
    far = "completely different words entirely unrelated content here " * 6
    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array([base, near, far])})
    rows = dedup.lsh_band_rows(t, "doc_id")
    by_key = {}
    for r in rows.to_pylist():
        by_key.setdefault((r["band"], r["band_hash"]), set()).add(r["doc_id"])
    shared_12 = any({1, 2} <= v for v in by_key.values())
    shared_13 = any({1, 3} <= v for v in by_key.values())
    assert shared_12 and not shared_13


def test_jaccard_verify_and_clusters():
    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array(["a b c d e f", "a b c d e g"])})
    h, counts = dedup._token_hashes(t, "text", 2)
    offs = np.concatenate(([0], np.cumsum(counts)))
    sets = [set(h[offs[i]:offs[i + 1]].tolist()) for i in range(2)]
    pairs = dedup.jaccard_pairs(np.array([1, 2]), sets, 0.5)
    assert pairs == [(1, 2)]
    assert dedup.jaccard_pairs(np.array([1, 2]), sets, 0.95) == []
    reps = dedup.clusters_from_pairs([(1, 2), (2, 5), (7, 9)])
    assert reps[5] == 1 and reps[2] == 1 and reps[9] == 7


def test_simhash_near_for_similar_far_for_different():
    base = "alpha beta gamma delta epsilon zeta " * 10
    near = base.replace("zeta", "zetta")
    far = "one two three four five six seven eight nine ten " * 10
    t = pa.table({"text": pa.array([base, near, far])})
    h = dedup.simhash(t)
    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")
    assert ham(h[0], h[1]) < ham(h[0], h[2])


def test_brute_force_topk_matches_numpy(ray_session):
    import ray
    import ray.data

    rng = np.random.default_rng(3)
    m = rng.standard_normal((50, 8)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(50), type=pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        type=pa.list_(pa.float32()))})
    q = m[:2].astype(np.float64)
    qref = ray.put((np.array([0, 1]), q))
    ds = ray.data.from_arrow(t)
    cands = ds.map_batches(similarity.BruteForceTopK,
                           batch_format="pyarrow", concurrency=1,
                           fn_constructor_args=(qref, 5))
    cand_tbl = pa.concat_tables(
        list(cands.iter_batches(batch_format="pyarrow")))
    top = similarity.merge_topk(cand_tbl, 5)

    mn = m.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    sims = mn[:2] @ mn.T
    for qi in (0, 1):
        order = np.lexsort((np.arange(50), -sims[qi]))[:5]
        got = [r["neighbor_id"] for r in top.to_pylist()
               if r["query_id"] == qi]
        assert got == list(order)


def test_lsh_bucket_same_vector_same_bucket():
    m = np.eye(4, dtype=np.float32)
    t = pa.table({"vec_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                  "embedding": pa.array(
                      [list(map(float, r)) for r in np.vstack([m, m])[:4]],
                      type=pa.list_(pa.float32()))})
    out = similarity.lsh_bucket_rows(t)
    buckets = out.column("bucket").to_pylist()
    assert len(buckets) == 4


def test_multimodal_roundtrip_and_stage():
    blob = multimodal.FakeImageCodec.encode(12, 34, b"payload")
    d = multimodal.FakeImageCodec.decode(blob)
    assert (d["width"], d["height"], d["n_bytes"]) == (12, 34, 7)

    t = pa.table({"doc_id": pa.array([7], type=pa.int64()),
                  "text": pa.array(["hello world"])})
    imgs = multimodal.synthesize_image_column(t)
    stage = multimodal.ImageFeatureStage()
    feats = stage(imgs)
    assert feats.column("width").to_pylist() == [7 % 640 + 1]
    assert feats.column("n_bytes").to_pylist() == [len(b"hello world")]

    with pytest.raises(NotImplementedError):
        multimodal.PillowImageDecoder().decode(blob)


def test_frame_sample_explodes():
    payload = bytes(range(256)) * 2
    blob = multimodal.FakeImageCodec.encode(1, 1, payload)
    t = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "video": pa.array([blob], type=pa.large_binary())})
    out = multimodal.frame_sample(t, every=2)
    assert out.column("frame").to_pylist() == [0, 2, 4, 6]
    assert all(len(b) == 64 for b in out.column("frame_bytes").to_pylist())


def test_dedup_queries_collapse_injected_duplicates(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from parquet_producers_ray.pipelines.queries import (q_dedup_exact,
                                                         q_dedup_minhash)

    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    near = base.replace("lazy", "sleepy")
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([base, base, near,
                          "totally different content " * 8]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    exact = {r["doc_id"] for r in q_dedup_exact(str(tmp_path)).take_all()}
    assert exact == {1, 3, 4}   # doc 2 is an exact dup of doc 1

    pairs = {(r["id_a"], r["id_b"])
             for r in q_dedup_minhash(str(tmp_path)).take_all()}
    assert (1, 2) in pairs      # exact dup pair verified
    assert (1, 3) in pairs      # near dup pair verified
    assert not any(4 in p for p in pairs)   # unrelated never pairs

    reps = {r["doc_id"]: r["rep_id"]
            for r in q_dedup_minhash(str(tmp_path),
                                     emit="reps").take_all()}
    assert reps[2] == 1         # exact dup clusters with 1
    assert reps[3] == 1         # near dup clusters with 1
    assert reps[4] == 4         # unrelated keeps itself


def test_inverted_index_jaccard_matches_direct():
    """distinct_gram_rows + gram_pair_rows reproduce the direct
    set-based bigram Jaccard on a corpus with known near-dups."""
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["the quick brown fox jumps",
                 "the quick brown fox leaps",   # near-dup of 1
                 "a completely different text body",
                 "the quick brown fox jumps"],  # exact dup of 1
    })
    grams = dedup.distinct_gram_rows(docs, "doc_id")
    # per-doc distinct bigram counts: 4 bigrams each for docs 1/2/4
    n_by_doc = {}
    for r in grams.to_pylist():
        n_by_doc[r["doc_id"]] = r["n_grams"]
    assert n_by_doc[1] == 4 and n_by_doc[3] == 4

    pairs = dedup.gram_pair_rows(grams)
    inter = {}
    for r in pairs.to_pylist():
        k = (r["id_a"], r["id_b"])
        inter[k] = inter.get(k, 0) + 1
        assert r["n_a"] == n_by_doc[r["id_a"]]
        assert r["n_b"] == n_by_doc[r["id_b"]]
    assert inter[(1, 4)] == 4          # exact dup: all 4 bigrams shared
    assert inter[(1, 2)] == 3          # one differing tail bigram
    assert (1, 3) not in inter         # disjoint docs never pair
    # threshold check 2*inter >= union
    assert 2 * inter[(1, 4)] >= 4 + 4 - inter[(1, 4)]
    assert 2 * inter[(1, 2)] >= 4 + 4 - inter[(1, 2)]


def test_gram_pair_rows_max_df_caps_stop_grams():
    grams = pa.table({
        "gram": pa.array([7, 7, 7, 9, 9], pa.int64()),
        "doc_id": pa.array([1, 2, 3, 1, 2], pa.int64()),
        "n_grams": pa.array([5, 5, 5, 5, 5], pa.int64())})
    capped = dedup.gram_pair_rows(grams, max_df=2)
    assert {(r["id_a"], r["id_b"]) for r in capped.to_pylist()} == {(1, 2)}
    full = dedup.gram_pair_rows(grams)
    assert full.num_rows == 3 + 1


def test_ivf_recall_and_full_probe_exactness(ray_session):
    """IVF with nprobe = n_centroids scans everything → must equal the
    brute-force top-k; at nprobe = half the centroids, recall@10 stays
    high on clustered synthetic data."""
    from parquet_producers_ray.pipelines.queries import q_ann_ivf, q_ann_topk

    sf = "/root/testdata/sf0.001"
    exact = {(r["query_id"], r["neighbor_id"])
             for r in q_ann_topk(sf).take_all()}
    full = {(r["query_id"], r["neighbor_id"])
            for r in q_ann_ivf(sf, n_centroids=8, nprobe=8).take_all()}
    assert full == exact
    approx = {(r["query_id"], r["neighbor_id"])
              for r in q_ann_ivf(sf, n_centroids=8, nprobe=4).take_all()}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, recall


def test_combine_pair_counts_partial_then_final():
    raw = pa.table({
        "id_a": pa.array([1, 1, 1, 2], pa.int64()),
        "id_b": pa.array([2, 2, 3, 3], pa.int64()),
        "n_a": pa.array([4, 4, 4, 6], pa.int64()),
        "n_b": pa.array([5, 5, 7, 7], pa.int64())})
    part = dedup.combine_pair_counts(raw)
    got = {(r["id_a"], r["id_b"]): (r["inter"], r["n_a"], r["n_b"])
           for r in part.to_pylist()}
    assert got == {(1, 2): (2, 4, 5), (1, 3): (1, 4, 7), (2, 3): (1, 6, 7)}
    # final combine over two partials sums the counts
    two = pa.concat_tables([part, part])
    final = dedup.combine_pair_counts(two, inter_col="inter")
    got2 = {(r["id_a"], r["id_b"]): r["inter"] for r in final.to_pylist()}
    assert got2 == {(1, 2): 4, (1, 3): 2, (2, 3): 2}


def test_half_tau_prune_drops_impossible_pairs():
    grams = pa.table({
        "gram": pa.array([7, 7], pa.int64()),
        "doc_id": pa.array([1, 2], pa.int64()),
        "n_grams": pa.array([2, 100], pa.int64())})  # 3*2 < 102
    assert dedup.gram_pair_rows(grams, half_tau_prune=True).num_rows == 0
    assert dedup.gram_pair_rows(grams).num_rows == 1


def test_kmv_sketch_exact_below_k_and_bounded_error_above():
    from parquet_producers_ray.functions import sketch

    # exact regime: 3 groups, < k distinct values each
    t = pa.table({"g": pa.array(["a"] * 6 + ["b"] * 4 + ["c"] * 2),
                  "v": pa.array([1, 1, 2, 3, 3, 4, 9, 9, 9, 10, 7, 7],
                                pa.int64())})
    part = sketch.kmv_partial(t, "g", "v", k=16)
    got = {}
    for key in ("a", "b", "c"):
        grp = part.filter(pa.compute.equal(part.column("g"), key))
        est = sketch.kmv_merge_estimate(grp, k=16, out_col="n")
        got[key] = est.column("n")[0].as_py()
    assert got == {"a": 4, "b": 2, "c": 1}

    # merge associativity: two partials over disjoint halves == one pass
    import numpy as np
    big = pa.table({"g": pa.array(["x"] * 100000),
                    "v": pa.array(np.arange(100000) % 40000, pa.int64())})
    k = 1024
    p1 = sketch.kmv_partial(big.slice(0, 50000), "g", "v", k)
    p2 = sketch.kmv_partial(big.slice(50000), "g", "v", k)
    merged = sketch.kmv_merge_estimate(pa.concat_tables([p1, p2]), k,
                                       out_col="n")
    est = merged.column("n")[0].as_py()
    assert abs(est - 40000) / 40000 < 0.10, est
    one = sketch.kmv_merge_estimate(sketch.kmv_partial(big, "g", "v", k),
                                    k, out_col="n")
    assert one.column("n")[0].as_py() == est


def test_winnow_fingerprints_position_robust():
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight") * 3
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [base, "PREFIX SHIFT >> " + base, "unrelated content " * 12]})
    out = text.winnow_fingerprints(docs)
    by_doc = {}
    for r in out.to_pylist():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # density ~ 2/(w+1): selections exist and are far fewer than shingles
    assert 0 < len(by_doc[1]) < len(base)
    # shifting the doc by a prefix keeps most selected fingerprints
    overlap = len(by_doc[1] & by_doc[2]) / len(by_doc[1])
    assert overlap > 0.8, overlap
    # unrelated text shares almost nothing
    noise = len(by_doc[1] & by_doc[3]) / len(by_doc[1])
    assert noise < 0.1, noise
    # deterministic across calls and across batch slicing
    again = text.winnow_fingerprints(docs.slice(0, 1))
    assert {r["fp"] for r in again.to_pylist()} == by_doc[1]


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
_texts = st.lists(st.lists(_words, min_size=0, max_size=12)
                  .map(" ".join), min_size=1, max_size=10)


@settings(max_examples=25, deadline=None)
@given(_texts)
def test_inverted_index_jaccard_property(texts):
    """The distributed formulation (distinct grams → co-occurrence
    counts → integer threshold) equals the direct set-based bigram
    Jaccard on arbitrary small corpora, including empty/short docs."""
    docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})
    grams = dedup.distinct_gram_rows(docs, "doc_id")
    pairs = dedup.combine_pair_counts(dedup.gram_pair_rows(grams))
    got = set()
    for r in pairs.to_pylist():
        if 2 * r["inter"] >= r["n_a"] + r["n_b"] - r["inter"]:
            got.add((r["id_a"], r["id_b"]))

    def bigrams(t):
        w = t.lower().split(" ")
        return {(w[i], w[i + 1]) for i in range(len(w) - 1)}

    sets = [bigrams(t) for t in texts]
    want = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union and 2 * inter >= union:
                want.add((i, j))
    assert got == want


def test_audio_codec_and_chunk_stage():
    from parquet_producers_ray.stages.multimodal import (AudioChunkStage,
                                                         FakeAudioCodec,
                                                         synthesize_audio_column)

    samples = np.arange(-500, 500, 10, dtype=np.int16)
    blob = FakeAudioCodec.encode(16000, samples)
    rate, back = FakeAudioCodec.decode(blob)
    assert rate == 16000 and np.array_equal(back, samples)

    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": ["hello world " * 40, "x"]})
    audio = synthesize_audio_column(docs)
    out = AudioChunkStage()(audio)
    rows = out.to_pylist()
    # chunk size = 16000*25/1000 = 400 samples; doc 1 has 480 bytes
    doc1 = [r for r in rows if r["doc_id"] == 1]
    assert [r["chunk"] for r in doc1] == [0, 1]
    assert doc1[0]["n_samples"] == 400 and doc1[1]["n_samples"] == 80
    doc2 = [r for r in rows if r["doc_id"] == 2]
    assert len(doc2) == 1 and doc2[0]["n_samples"] == 1
    assert all(r["rms"] > 0 and r["peak"] > 0 for r in doc1)


def test_png_codec_roundtrip_all_filters():
    """PngCodec encode cycles all five scanline filters; decode must
    reconstruct pixels bit-exactly for arbitrary grids (incl. 1-wide
    and 1-tall edge shapes where Sub/Paeth predictors degenerate)."""
    from parquet_producers_ray.stages.multimodal import PngCodec

    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (1, 17), (17, 1), (6, 6), (13, 40), (48, 64)]:
        px = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        blob = PngCodec.encode(px)
        assert bytes(blob[:8]) == b"\x89PNG\r\n\x1a\n"
        back = PngCodec.decode_pixels(blob)
        assert np.array_equal(back, px), (h, w)


def test_gif_lzw_roundtrip_across_width_boundaries():
    """GIF LZW is variable-width (9→12 bits): the encoder bumps the
    width one emission after assigning entry 2^w, the decoder one
    table-append earlier (it lags an entry).  A randomized roundtrip
    long enough to cross the 512/1024/2048/4096 boundaries — and a
    run-heavy input that forces deep chains and a mid-stream CLEAR
    reset — proves the two bookkeepings agree bit-for-bit."""
    from parquet_producers_ray.stages.multimodal import (
        _lzw_decode_gif, _lzw_encode_gif)

    rng = np.random.RandomState(11)
    for n in [0, 1, 2, 700, 60_000, 200_000]:
        for alpha in (2, 17, 256):
            x = rng.randint(0, alpha, size=n).astype(np.uint8)
            assert np.array_equal(_lzw_decode_gif(_lzw_encode_gif(x)), x), \
                (n, alpha)
    runs = np.repeat(np.arange(50, dtype=np.uint8), 5000)
    assert np.array_equal(_lzw_decode_gif(_lzw_encode_gif(runs)), runs)
    # cScSc case: the decoder must synthesize the not-yet-added entry
    x = np.array([1, 1, 1, 1, 1], np.uint8)
    assert np.array_equal(_lzw_decode_gif(_lzw_encode_gif(x)), x)


def test_gif_container_multiframe_roundtrip():
    """Full GIF89a container: logical screen descriptor + grayscale
    GCT + NETSCAPE loop extension + per-frame GCE/descriptor blocks,
    sub-block framing past 255 bytes, trailer.  Every frame decodes
    bit-exactly; unknown extensions are skipped by the block walk."""
    from parquet_producers_ray.stages.multimodal import GifCodec

    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 256, size=(21, 37)).astype(np.uint8)
              for _ in range(4)]
    blob = GifCodec.encode_frames(frames)
    assert bytes(blob[:6]) == b"GIF89a" and blob[-1] == 0x3B
    back = GifCodec.decode_frames(blob)
    assert len(back) == 4
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)
    # an injected unknown extension (comment block) must be skipped
    idx = blob.index(b"\x21\xF9")           # before the first GCE
    patched = blob[:idx] + b"\x21\xFE\x05hello\x00" + blob[idx:]
    back2 = GifCodec.decode_frames(patched)
    assert len(back2) == 4 and np.array_equal(back2[0], frames[0])


def test_gif_frame_stage_matches_synthesis_rule():
    """GifFrameStage digests of genuinely decoded frames equal a plain
    numpy replay of the synthesis rule (pixel p of frame k = text byte
    (p + 11k) mod n), including the empty-text zero-grid row."""
    from parquet_producers_ray.stages.multimodal import (
        GifFrameStage, synthesize_gif_column)

    docs = pa.table({"doc_id": pa.array([3, 70, 113], pa.int64()),
                     "text": ["the quick brown fox " * 10, "", "z" * 999]})
    gifs = synthesize_gif_column(docs)
    out = GifFrameStage()(gifs).to_pylist()
    texts = dict(zip(docs.column("doc_id").to_pylist(),
                     docs.column("text").to_pylist()))
    seen = set()
    for row in out:
        i = row["doc_id"]
        raw = np.frombuffer(texts[i].encode(), np.uint8)
        w, h, nf = i % 16 + 4, i % 12 + 4, i % 4 + 2
        k = row["frame"]
        seen.add((i, k))
        assert k % 2 == 0 and k < nf
        if len(raw):
            want = raw[(np.arange(w * h) + 11 * k) % len(raw)]
        else:
            want = np.zeros(w * h, np.uint8)
        want = want.astype(np.int64)
        assert row["f_sum"] == int(want.sum())
        assert row["f_wsum"] == int(
            (want * np.arange(1, w * h + 1)).sum())
    for i in (3, 70, 113):
        nf = i % 4 + 2
        assert {(i, k) for k in range(0, nf, 2)} <= seen


def test_jpeg_codec_baseline_roundtrip_bounds():
    """Baseline JFIF: constant blocks quantize to DC-only — exact at
    quality 100 (unit quant step) and within DC-step/16 at quality 50;
    noise (the worst case for a DCT codec) stays within tight bounds
    at high quality; marker structure is standard
    (SOI/APP0/DQT/SOF0/DHT/SOS/EOI); byte stuffing and odd
    (non-multiple-of-8) shapes round-trip."""
    from parquet_producers_ray.stages.jpeg import JpegCodec

    for v in (0, 77, 128, 255):
        px = np.full((24, 40), v, np.uint8)
        assert np.array_equal(
            JpegCodec.decode_pixels(JpegCodec.encode(px, 100)), px)
        got = JpegCodec.decode_pixels(JpegCodec.encode(px, 50))
        assert int(np.abs(got.astype(int) - px.astype(int)).max()) <= 1

    rng = np.random.RandomState(3)
    bounds = {90: 20, 95: 10, 100: 2}
    for (h, w) in [(1, 1), (7, 5), (17, 33), (48, 64)]:
        for q, tol in bounds.items():
            px = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
            blob = JpegCodec.encode(px, q)
            assert blob[:2] == b"\xFF\xD8" and blob[-2:] == b"\xFF\xD9"
            out = JpegCodec.decode_pixels(blob)
            assert out.shape == (h, w)
            err = int(np.abs(out.astype(int) - px.astype(int)).max())
            assert err <= tol, (h, w, q, err)

    # a gradient (smooth content) is exact at quality 95
    g = (np.linspace(0, 255, 64)[None, :]
         * np.ones((32, 1))).astype(np.uint8)
    assert np.array_equal(
        JpegCodec.decode_pixels(JpegCodec.encode(g, 95)), g)


def test_jpeg_recon_stage_bounds_and_dims():
    """JpegReconStage decodes genuine JFIF blobs and its in-pipeline
    tolerance verdict holds for ASCII-text pixels at quality 95 with
    margin (measured error ≤7 on full-range noise; the query ships
    tol=12)."""
    from parquet_producers_ray.stages.jpeg import JpegCodec
    from parquet_producers_ray.stages.multimodal import (
        JpegReconStage, synthesize_jpeg_column)

    docs = pa.table({"doc_id": pa.array([3, 70, 113], pa.int64()),
                     "text": ["the quick brown fox " * 10, "",
                              "zebra! " * 500]})
    blobs = synthesize_jpeg_column(docs)
    blobs = blobs.append_column("text", docs.column("text"))
    out = JpegReconStage(tol=12)(blobs).to_pylist()
    assert len(out) == 3
    for row in out:
        i = row["doc_id"]
        assert row["width"] == i % 48 + 8
        assert row["height"] == i % 32 + 8
        assert row["mcu_blocks"] == \
            -(-row["width"] // 8) * -(-row["height"] // 8)
        assert row["recon_ok"] is True
    # and the tight measured bound: decode error <= 7 on these rows
    for i, t in zip([3, 70, 113], docs.column("text").to_pylist()):
        w, h = i % 48 + 8, i % 32 + 8
        raw = np.frombuffer(t.encode(), np.uint8)
        want = (raw[np.arange(w * h) % len(raw)].reshape(h, w)
                if len(raw) else np.zeros((h, w), np.uint8))
        got = JpegCodec.decode_pixels(JpegCodec.encode(want, 95))
        assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 7


def test_jpeg_color_codec_roundtrip_bounds():
    """Round-5 color path (VERDICT item 2): 3-component YCbCr baseline
    JFIF with 4:2:0 and 4:4:4 chroma.  Constant color is exact at
    quality 100 at both subsamplings (DC-only blocks, unit quant
    step); random RGB at 4:4:4 quality 100 stays within ±2 (color
    conversion round-trip); the MCU-aligned smooth-chroma source rule
    stays within the shipped tol=32 with headroom; odd sizes crop
    correctly; grayscale still decodes to a 2-D array."""
    from parquet_producers_ray.stages.jpeg import JpegCodec, ycbcr_to_rgb

    for rgb in ((0, 0, 0), (255, 255, 255), (200, 90, 30)):
        px = np.zeros((24, 40, 3), np.uint8)
        px[..., 0], px[..., 1], px[..., 2] = rgb
        for ss in ("420", "444"):
            out = JpegCodec.decode_pixels(
                JpegCodec.encode(px, 100, subsampling=ss))
            assert out.shape == px.shape
            assert int(np.abs(out.astype(int) - px.astype(int)).max()) \
                <= 1, (rgb, ss)

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(17, 29, 3)).astype(np.uint8)
    out = JpegCodec.decode_pixels(
        JpegCodec.encode(px, 100, subsampling="444"))
    assert out.shape == (17, 29, 3)
    assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 2

    # MCU-grid-aligned smooth chroma + noise luma (the query's source
    # shape): bounded well under the shipped tolerance at 4:2:0
    h, w = 45, 70
    y = rng.randint(0, 256, size=(h, w)).astype(np.float64)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    src = ycbcr_to_rgb(y, 96.0 + 8.0 * (xx // 16 % 8),
                       96.0 + 4.0 * (yy // 16 % 8))
    out = JpegCodec.decode_pixels(JpegCodec.encode(src, 95, "420"))
    assert out.shape == (h, w, 3)
    assert int(np.abs(out.astype(int) - src.astype(int)).max()) <= 26

    gray = rng.randint(0, 256, size=(9, 13)).astype(np.uint8)
    assert JpegCodec.decode_pixels(JpegCodec.encode(gray, 95)).ndim == 2


def test_jpeg_color_recon_stage_and_corpus_bound(sf_dir):
    """JpegColorReconStage decodes genuine 4:2:0 blobs, its dims/MCU
    outputs replay the closed-form rule, and the FULL sf0.001 corpus
    sweep stays ≤ 24 (the query ships tol=32 — headroom pinned)."""
    import os

    import pyarrow.parquet as pq

    from parquet_producers_ray.stages.jpeg import JpegCodec
    from parquet_producers_ray.stages.multimodal import (
        JpegColorReconStage, _color_jpeg_source,
        synthesize_jpeg_color_column)

    docs = pa.table({"doc_id": pa.array([3, 70, 113], pa.int64()),
                     "text": ["the quick brown fox " * 10, "",
                              "zebra! " * 500]})
    blobs = synthesize_jpeg_color_column(docs)
    blobs = blobs.append_column("text", docs.column("text"))
    out = JpegColorReconStage(tol=32)(blobs).to_pylist()
    assert len(out) == 3
    for row in out:
        i = row["doc_id"]
        assert row["width"] == i % 40 + 8
        assert row["height"] == i % 24 + 8
        assert row["mcus"] == \
            -(-row["width"] // 16) * -(-row["height"] // 16)
        assert row["recon_ok"] is True

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    worst = 0
    for i, txt in zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()):
        src = _color_jpeg_source(int(i), txt)
        back = JpegCodec.decode_pixels(
            JpegCodec.encode(src, 95, subsampling="420"))
        worst = max(worst,
                    int(np.abs(back.astype(int) - src.astype(int)).max()))
    assert worst <= 24, worst          # measured 19; tol=32 headroom


def test_sniff_image_decoder_routes_all_formats():
    """One feature stage over a mixed corpus: PNG, JPEG, animated GIF
    and the FIMG stand-in all decode through the sniffing default."""
    import zlib

    from parquet_producers_ray.stages.jpeg import JpegCodec
    from parquet_producers_ray.stages.multimodal import (
        FakeImageCodec, GifCodec, ImageFeatureStage, PngCodec)

    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, size=(12, 20)).astype(np.uint8)
    frames = [px, (px[::-1]).copy()]
    blobs = [PngCodec.encode(px),
             JpegCodec.encode(px, 95),
             GifCodec.encode_frames(frames),
             FakeImageCodec.encode(20, 12, px.tobytes())]
    batch = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "image": pa.array(blobs, pa.large_binary())})
    out = ImageFeatureStage()(batch).to_pylist()
    assert [(r["width"], r["height"]) for r in out] == [(20, 12)] * 4
    # PNG is lossless: checksum equals the source pixels' crc
    assert out[0]["checksum"] == zlib.crc32(px.tobytes())
    # GIF covers every frame
    assert out[2]["n_bytes"] == 2 * px.size
    crc = zlib.crc32(frames[0].tobytes())
    assert out[2]["checksum"] == zlib.crc32(frames[1].tobytes(), crc)
    # JPEG is lossy but dims + byte count are exact
    assert out[1]["n_bytes"] == px.size


def test_png_thumbnail_stage_matches_bruteforce():
    """Decode → NN-resample → re-encode → re-decode digests equal a
    plain numpy replay of the same rule."""
    from parquet_producers_ray.stages.multimodal import (
        PngCodec, PngThumbnailStage, synthesize_png_column)

    docs = pa.table({"doc_id": pa.array([3, 70, 113], pa.int64()),
                     "text": ["the quick brown fox " * 30,
                              "tiny", "z" * 5000]})
    pngs = synthesize_png_column(docs)
    out = PngThumbnailStage(width=16, height=16)(pngs)
    wgt = np.arange(1, 257, dtype=np.int64)
    for row in out.to_pylist():
        i = row["doc_id"]
        text = docs.column("text")[
            docs.column("doc_id").to_pylist().index(i)].as_py()
        w, h = i % 64 + 1, i % 48 + 1
        raw = np.frombuffer(text.encode(), np.uint8)[:w * h]
        grid = np.zeros(w * h, np.uint8)
        grid[:len(raw)] = raw
        grid = grid.reshape(h, w)
        ri = (np.arange(16) * h) // 16
        ci = (np.arange(16) * w) // 16
        want = grid[np.ix_(ri, ci)].reshape(-1).astype(np.int64)
        assert row["payload_sum"] == int(want.sum())
        assert row["payload_wsum"] == int((want * wgt).sum())
        # the emitted thumbnail is itself a valid PNG of those pixels
        back = PngCodec.decode_pixels(row["thumb"])
        assert np.array_equal(back.reshape(-1).astype(np.int64), want)


def test_wav_codec_real_riff_roundtrip():
    """WavCodec writes canonical RIFF/WAVE PCM16 mono readable by the
    stdlib `wave` module, and its chunk walk survives extra metadata
    chunks and word-alignment padding."""
    import io
    import struct
    import wave

    from parquet_producers_ray.stages.multimodal import WavCodec

    samples = np.arange(-500, 500, 10, dtype=np.int16)
    blob = WavCodec.encode(16000, samples)

    # independent reader: the stdlib wave module accepts the container
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 16000
        frames = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    assert np.array_equal(frames, samples)

    rate, back = WavCodec.decode(blob)
    assert rate == 16000 and np.array_equal(back, samples)

    # odd-length data chunk → pad byte; decode must not include it
    odd = WavCodec.encode(8000, np.array([7], dtype=np.int16))
    # splice a LIST metadata chunk between fmt and data (real-world
    # WAV files carry these); decode must skip it
    pos = odd.index(b"data")
    meta = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = odd[:pos] + meta + odd[pos:]
    spliced = (spliced[:4]
               + struct.pack("<I", len(spliced) - 8) + spliced[8:])
    rate2, back2 = WavCodec.decode(spliced)
    assert rate2 == 8000 and back2.tolist() == [7]

    # compressed formats stay the documented lib-backed boundary
    # (stereo/8/24/32-bit/float are decoded since round 5 —
    # test_wav_codec_real_corpus_variants)
    stereo_fmt = struct.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)
    bad = (b"RIFF" + struct.pack("<I", 4 + 8 + len(stereo_fmt) + 8)
           + b"WAVE" + b"fmt " + struct.pack("<I", len(stereo_fmt))
           + stereo_fmt + b"data" + struct.pack("<I", 0))
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        WavCodec.decode(bad)


def test_wav_codec_property_roundtrip():
    """Property: any int16 sample array at any plausible rate
    round-trips bit-exactly through the real RIFF/WAVE container."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parquet_producers_ray.stages.multimodal import WavCodec

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.integers(-32768, 32767), max_size=300),
           st.sampled_from([8000, 16000, 22050, 44100, 48000]))
    def inner(samples, rate):
        arr = np.array(samples, dtype=np.int16)
        r, back = WavCodec.decode(WavCodec.encode(rate, arr))
        assert r == rate and np.array_equal(back, arr)

    inner()


def test_audio_chunk_stage_decodes_real_wav():
    """synthesize_audio_column now emits genuine WAV containers and
    the chunk stage decodes them (sniffing WAV vs the FAUD stand-in
    per blob) — feature values identical across containers."""
    from parquet_producers_ray.stages.multimodal import (
        AudioChunkStage, FakeAudioCodec, synthesize_audio_column)

    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": ["hello world " * 40, "x"]})
    wav_audio = synthesize_audio_column(docs)
    assert all(bytes(b[:4]) == b"RIFF"
               for b in wav_audio.column("audio").to_pylist())
    faud_audio = synthesize_audio_column(docs, codec=FakeAudioCodec)
    out_wav = AudioChunkStage()(wav_audio)
    out_faud = AudioChunkStage()(faud_audio)
    assert out_wav.equals(out_faud)


def test_bpe_token_counts_examples():
    t = pa.table({"text": ["Hello, world! I'm fine.", "", "don't stop 42x"]})
    out = text.bpe_token_counts(t)
    # don | 't | ' stop' | ' 42' | 'x' -> 5
    assert out.column("n_bpe_tokens").to_pylist() == [8, 0, 5]


def test_kmv_sketch_null_semantics_match_sql():
    """count(DISTINCT v) ignores null values, an all-null-value group
    still exists with count 0, and a null key is its own group."""
    from parquet_producers_ray.functions import sketch

    t = pa.table({"g": pa.array(["a", None, "b", None, "a", "b"]),
                  "v": pa.array([1, 2, None, 4, 1, None], pa.int64())})
    p = sketch.kmv_partial(t, "g", "v", k=16)
    import pyarrow.compute as _pc
    for key, want in [("a", 1), ("b", 0), (None, 2)]:
        m = _pc.is_null(p.column("g")) if key is None \
            else _pc.equal(p.column("g"), key)
        est = sketch.kmv_merge_estimate(p.filter(m), 16, "n")
        assert est.column("n")[0].as_py() == want, key


def test_image_stage_null_blobs_and_empty_segment_decode(ray_session):
    from parquet_producers_ray.stages.encode import (decode_segments_batch,
                                                     encode_table)
    from parquet_producers_ray.stages.multimodal import ImageFeatureStage

    # null media rows yield null feature rows, not a crash
    blob = multimodal.FakeImageCodec.encode(2, 3, b"xy")
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "image": pa.array([blob, None], pa.large_binary())})
    out = ImageFeatureStage()(t)
    assert out.column("width").to_pylist() == [2, None]

    # zero-row segment batches decode to an empty source-schema table
    seg, _ = encode_table(pa.table({"k": ["a"], "v": [1]}))
    empty = decode_segments_batch(seg.slice(0, 0))
    assert empty.num_rows == 0
    assert empty.schema.names == ["k", "v"]


def test_mg_sketch_exact_below_m_and_bounded_undercount_above():
    from ray.data.aggregate import Sum

    from parquet_producers_ray.functions import sketch

    # exact regime: distinct ≤ m everywhere → counts are true counts
    vals = pa.table({"x": pa.array([1, 1, 1, 2, 2, 3] * 5, pa.int64())})
    p = sketch.mg_partial(vals, "x", m=16)
    got = dict(zip(p.column("x").to_pylist(), p.column("n").to_pylist()))
    assert got == {1: 15, 2: 10, 3: 5}

    # truncated regime: zipf-ish stream, m = 8 ≪ 100 distinct.
    # MG guarantees: (a) ≤ m counters, (b) undercount per item ≤ n/(m+1),
    # (c) merge of slice partials == sum-then-truncate (mergeability)
    rng = np.random.RandomState(7)
    stream = (rng.zipf(1.5, 20000) % 100).astype(np.int64)
    n = len(stream)
    t = pa.table({"x": pa.array(stream)})
    m = 8
    p1 = sketch.mg_partial(t.slice(0, n // 2), "x", m)
    p2 = sketch.mg_partial(t.slice(n // 2), "x", m)
    merged = pa.concat_tables([p1, p2]).group_by(["x"]).aggregate(
        [("n", "sum")]).rename_columns(["x", "n"])
    items = np.arange(merged.num_rows)
    idx, cnt = sketch.mg_truncate(items, merged.column("n").to_numpy(
        zero_copy_only=False), m)
    assert len(idx) <= m
    true = {v: int(c) for v, c in
            zip(*np.unique(stream, return_counts=True))}
    kept = merged.column("x").take(pa.array(idx)).to_pylist()
    for item, est in zip(kept, cnt):
        assert 0 < est <= true[item]
        # total error across both truncations ≤ 2·n/(m+1)
        assert true[item] - est <= 2 * n / (m + 1)
    # the true heavy hitter (zipf mode = 1) always survives
    mode = max(true, key=true.get)
    assert mode in kept


def test_range_join_counts_match_brute_force():
    # the searchsorted band counter == per-pair brute force, including
    # overlapping bands and boundary semantics (lo inclusive, hi excl.)
    rng = np.random.RandomState(3)
    v = np.round(rng.uniform(0, 100, 500), 2)
    lo = np.array([0.0, 10.0, 10.0, 95.0, 200.0])
    hi = np.array([10.0, 20.0, 30.0, 100.0, 300.0])
    s = np.sort(v)
    fast = np.searchsorted(s, hi, "left") - np.searchsorted(s, lo, "left")
    brute = [(int(((v >= a) & (v < b)).sum())) for a, b in zip(lo, hi)]
    assert fast.tolist() == brute


def test_hist_sketch_exact_and_binned_paths():
    from parquet_producers_ray.functions import sketch

    rng = np.random.RandomState(5)
    data = rng.gamma(4.0, 10.0, 30000)
    t = pa.table({"x": pa.array(data)})

    def merge(parts):
        m = pa.concat_tables(parts).group_by(["v"]).aggregate(
            [("cnt", "sum")]).rename_columns(["v", "cnt"])
        return (m.column("v").to_numpy(zero_copy_only=False),
                m.column("cnt").to_numpy(zero_copy_only=False))

    # exact path: value_counts partials over slices == direct formula
    vi = np.round(data).astype(np.int64)
    ti = pa.table({"x": pa.array(vi)})
    v, c = merge([sketch.hist_partial(ti.slice(0, 10000), "x"),
                  sketch.hist_partial(ti.slice(10000), "x")])
    got = sketch.hist_quantiles(v, c, [0.5, 0.9, 0.99])
    s = np.sort(vi)
    want = [float(s[int(np.ceil(q * len(s))) - 1]) for q in (0.5, 0.9, 0.99)]
    assert got == want

    # binned path: fixed edges shared across blocks; answer is the left
    # edge of the true quantile's bin → within one bin width, and a
    # lower bound
    edges = np.linspace(0.0, data.max() + 1e-9, 257)
    width = edges[1] - edges[0]
    v, c = merge([sketch.hist_partial(t.slice(0, 15000), "x", edges),
                  sketch.hist_partial(t.slice(15000), "x", edges)])
    sd = np.sort(data)
    for q, est in zip((0.5, 0.9, 0.99),
                      sketch.hist_quantiles(v, c, [0.5, 0.9, 0.99])):
        true = float(sd[int(np.ceil(q * len(sd))) - 1])
        assert est <= true < est + 2 * width, (q, est, true)

    # empty input → NaN, not a crash
    assert np.isnan(sketch.hist_quantiles(
        np.zeros(0), np.zeros(0, np.int64), [0.5])[0])


def test_connected_components_matches_union_find(ray_session):
    import ray.data

    from parquet_producers_ray.functions.graph import connected_components

    rng = np.random.RandomState(17)
    # sparse random graph with long path chains mixed in (exercises both
    # the propagation and the pointer-jumping phases)
    n = 400
    src = rng.randint(0, n, 250).astype(np.int64)
    dst = rng.randint(0, n, 250).astype(np.int64)
    chain = np.arange(500, 560, dtype=np.int64)          # path component
    src = np.concatenate([src, chain[:-1]])
    dst = np.concatenate([dst, chain[1:]])

    # union-find ground truth
    parent = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(set(src.tolist()) | set(dst.tolist()))
    want = {x: find(x) for x in nodes}
    # normalize to min-of-component
    comp_min = {}
    for x, r in want.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    want = {x: comp_min[find(x)] for x in nodes}

    e = ray.data.from_arrow(pa.table({"src": pa.array(src),
                                      "dst": pa.array(dst)}))
    out = connected_components(e, num_partitions=4)
    got = {r["node"]: r["component"] for r in out.take_all()}
    assert got == want

    # the at-scale hash-join path (broadcast_threshold=0) must agree;
    # tiny graph only — each join round carries fixed actor costs
    path = pa.table({"src": pa.array([2, 3], pa.int64()),
                     "dst": pa.array([3, 1], pa.int64())})
    small = ray.data.from_arrow(path)
    for thresh in (64 << 20, 0):
        res = connected_components(small, num_partitions=2,
                                   broadcast_threshold=thresh)
        assert {r["node"]: r["component"] for r in res.take_all()} == \
            {1: 1, 2: 1, 3: 1}, thresh


def test_bloom_filter_no_false_negatives_and_low_fp():
    import numpy as np
    import pyarrow as pa

    from parquet_producers_ray.functions.sketch import (bloom_build,
                                                        bloom_maybe_contains)

    keys = pa.array(np.arange(0, 60000, 3))
    f = bloom_build(keys)
    probe = np.arange(120000)
    mask = bloom_maybe_contains(f, pa.array(probe))
    member = (probe % 3 == 0) & (probe < 60000)
    assert mask[member].all()            # never a false negative
    assert mask[~member].mean() < 0.01   # <1% false positives at 2^20 bits

    s = pa.array([f"url-{i}" for i in range(5000)])
    f2 = bloom_build(s)
    m2 = bloom_maybe_contains(f2, pa.array([f"url-{i}" for i in range(10000)]))
    assert m2[:5000].all()
    assert m2[5000:].mean() < 0.01


def _lev_ref(a: str, b: str) -> int:
    """Textbook O(len²) single-pair Levenshtein for cross-checking."""
    la, lb = len(a), len(b)
    row = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, row[0] = row[0], i
        for j in range(1, lb + 1):
            cur = min(row[j] + 1, row[j - 1] + 1,
                      prev + (a[i - 1] != b[j - 1]))
            prev, row[j] = row[j], cur
    return row[lb]


def test_lev_pairs_matches_reference_dp():
    """The pair-vectorized DP (queries._lev_pairs) must equal the
    textbook per-pair DP on equal-length pairs (the query's blocking
    key pins n_chars, so only equal-length pairs ever reach it)."""
    import itertools

    from parquet_producers_ray.pipelines.queries import _lev_pairs

    rng = np.random.default_rng(11)
    words = ["kitten", "mitten", "flaw", "lawn", "abcdefgh", "abcdxfgh",
             "aaaa", "abab", "x", "y"]
    words += ["".join(rng.choice(list("abc"), size=n))
              for n in rng.integers(1, 9, size=30)]
    pairs = [(x, y) for x, y in itertools.product(words, words)
             if len(x) == len(y)]
    L = 8
    A = np.asarray([x for x, _ in pairs], dtype=f"U{L}")
    B = np.asarray([y for _, y in pairs], dtype=f"U{L}")
    ln = np.asarray([len(x) for x, _ in pairs], dtype=np.int64)
    got = _lev_pairs(A.view(np.uint32).reshape(len(pairs), L),
                     B.view(np.uint32).reshape(len(pairs), L), ln)
    for k, (x, y) in enumerate(pairs):
        assert got[k] == _lev_ref(x, y), (x, y, got[k])


def test_image_resize_stage_exact_grid():
    """Nearest-neighbor resize on the fake format is exact: a 4x2
    image downsampled to 2x1 picks pixels (0,0) and (0,2); payloads
    shorter than width*height are zero-padded first."""
    from parquet_producers_ray.stages.multimodal import (FakeImageCodec,
                                                         ImageResizeStage)

    # 4 wide x 2 high, payload row-major: [10 20 30 40 / 50 60 70 80]
    blob = FakeImageCodec.encode(4, 2, bytes([10, 20, 30, 40,
                                              50, 60, 70, 80]))
    short = FakeImageCodec.encode(4, 2, bytes([10, 20]))  # zero-padded
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "image": pa.array([blob, short, None],
                                    pa.large_binary())})
    out = ImageResizeStage(width=2, height=1)(t)
    d0 = FakeImageCodec.decode(out.column("image")[0].as_py())
    assert (d0["width"], d0["height"]) == (2, 1)
    got = out.column("image")[0].as_py()[-2:]
    assert got == bytes([10, 30])          # cols 0 and 2 of row 0
    got_short = out.column("image")[1].as_py()[-2:]
    assert got_short == bytes([10, 0])     # padding shows through
    assert out.column("image")[2].as_py() is None
    assert out.column("checksum")[2].as_py() is None


def test_minhash_lsh_recall_on_gate_corpus():
    """Pin the dedup_minhash ORACLE CONTRACT (queries.py docstring): the
    LSH banding must catch EVERY exact bigram-Jaccard pair >= 0.7 on the
    gate corpus — the SQL oracle is an exact all-pairs Jaccard, so a
    band-parameter change that costs recall must fail HERE, in pytest,
    not as a driver hash-row mystery."""
    import itertools
    from collections import defaultdict

    import numpy as np
    import pyarrow.parquet as pq

    from parquet_producers_ray.functions.dedup import lsh_band_rows

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])

    # exact bigram-Jaccard pairs >= 0.7 (mirror of SQL_DEDUP_MINHASH)
    gsets, inv = {}, defaultdict(set)
    for i, tx in zip(t.column("doc_id").to_pylist(),
                     t.column("text").to_pylist()):
        ws = tx.lower().split(" ")
        gsets[i] = frozenset(zip(ws, ws[1:]))
        for g in gsets[i]:
            inv[g].add(i)
    exact = set()
    for docs in inv.values():
        if 1 < len(docs) < 50:
            for a, b in itertools.combinations(sorted(docs), 2):
                A, B = gsets[a], gsets[b]
                inter = len(A & B)
                if inter / (len(A) + len(B) - inter) >= 0.7:
                    exact.add((a, b))
    assert exact, "gate corpus must contain true near-dup pairs"

    # LSH candidates: same banding the query ships through Ray
    band_tbl = lsh_band_rows(t, "doc_id")
    buckets = defaultdict(list)
    for d, bd, bh in zip(
            band_tbl.column("doc_id").to_pylist(),
            band_tbl.column("band").to_pylist(),
            band_tbl.column("band_hash").to_pylist()):
        buckets[(bd, bh)].append(d)
    cand = set()
    for docs in buckets.values():
        if len(docs) > 1:
            for a, b in itertools.combinations(sorted(set(docs)), 2):
                cand.add((a, b))

    missed = exact - cand
    assert not missed, (
        f"LSH banding missed {len(missed)} true pairs (recall < 1.0): "
        f"{sorted(missed)[:5]} — dedup_minhash's exact-SQL oracle row "
        "would go red; re-derive num_perm/bands per the docstring bound")


def test_minhash_distributed_tail_differential(ray_session):
    """Force dedup_minhash's past-broadcast-threshold tail
    (pair_broadcast_rows=0: keyed-exchange pair distinct, left_semi
    candidate filter, hash-join half emission, distributed connected
    components for reps) and assert BOTH emit modes return exactly the
    broadcast formulation's result on the gate corpus."""
    import pandas as pd

    from parquet_producers_ray.pipelines.queries import q_dedup_minhash

    sf = "/root/testdata/sf0.001"

    def canon(ds, cols):
        df = ds.to_pandas()
        return df[cols].sort_values(cols).reset_index(drop=True)

    for emit, cols in (("pairs", ["id_a", "id_b"]),
                       ("reps", ["doc_id", "rep_id"])):
        want = canon(q_dedup_minhash(sf, emit=emit), cols)
        got = canon(q_dedup_minhash(sf, emit=emit,
                                    pair_broadcast_rows=0), cols)
        assert len(want) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_minhash_distributed_tail_real_hash_join(ray_session, monkeypatch):
    """Same differential, but with _safe_join's small-side broadcast
    ladder DISABLED (small_rows=0) so every join in the distributed
    tail takes the actual Ray hash-join branch — the only regime the
    tail ever runs in production (at sf0.001 the default ladder
    resolves every join by broadcast, leaving the hash-join path
    untested)."""
    import functools

    import pandas as pd

    from parquet_producers_ray.engine import produce
    from parquet_producers_ray.pipelines.queries import q_dedup_minhash

    real = produce._safe_join
    monkeypatch.setattr(
        produce, "_safe_join",
        functools.partial(real, small_rows=0))

    sf = "/root/testdata/sf0.001"

    def canon(ds, cols):
        df = ds.to_pandas()
        return df[cols].sort_values(cols).reset_index(drop=True)

    for emit, cols in (("pairs", ["id_a", "id_b"]),
                       ("reps", ["doc_id", "rep_id"])):
        want = canon(q_dedup_minhash(sf, emit=emit), cols)
        got = canon(q_dedup_minhash(sf, emit=emit,
                                    pair_broadcast_rows=0), cols)
        assert len(want) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_jaccard_count_join_differential(ray_session):
    """Force dedup_jaccard's past-broadcast-threshold τ filter
    (count_broadcast_rows=0: the per-doc count table stays a Dataset,
    each candidate pair picks up endpoint counts via two hash joins)
    and assert it returns exactly the broadcast formulation's pairs."""
    import pandas as pd

    from parquet_producers_ray.pipelines.queries import q_dedup_jaccard

    sf = "/root/testdata/sf0.001"
    cols = ["id_a", "id_b"]

    def canon(ds):
        df = ds.to_pandas()
        return df[cols].sort_values(cols).reset_index(drop=True)

    want = canon(q_dedup_jaccard(sf))
    got = canon(q_dedup_jaccard(sf, count_broadcast_rows=0))
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_jaccard_count_join_real_hash_join(ray_session, monkeypatch):
    """Count-join differential with the broadcast ladder disabled
    (small_rows=0): the two endpoint-count joins must survive the
    actual Ray hash-join branch they use past the threshold."""
    import functools

    import pandas as pd

    from parquet_producers_ray.engine import produce
    from parquet_producers_ray.pipelines.queries import q_dedup_jaccard

    monkeypatch.setattr(
        produce, "_safe_join",
        functools.partial(produce._safe_join, small_rows=0))

    sf = "/root/testdata/sf0.001"
    cols = ["id_a", "id_b"]

    def canon(ds):
        df = ds.to_pandas()
        return df[cols].sort_values(cols).reset_index(drop=True)

    want = canon(q_dedup_jaccard(sf))
    got = canon(q_dedup_jaccard(sf, count_broadcast_rows=0))
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_embed_neardup_lsh_recall_on_gate_corpus():
    """Pin embed_neardup_lsh's MEASURED sign-LSH recall against the
    UNBUCKETED exact cosine pair set.  Unlike dedup_minhash, the
    bucketed query's SQL oracle applies the same bucket filter — so by
    construction the driver row cannot catch recall loss; this test is
    where the recall contract lives.  At the low τ = 0.45 (θ ≈ 63°)
    one 6-plane table catches ≈ (1 − θ/π)^6 ≈ 0.08 of true pairs (the
    query docstring documents why multi-table unions don't rescue this
    τ); the corpora are deterministic, so the measured recalls are
    exact constants — a generator or bucket-function change shows up
    here, in pytest, not as silent divergence."""
    import pyarrow.parquet as pq

    from parquet_producers_ray.functions.similarity import (
        embedding_matrix, normalize)

    # (exact-pair count, bucketed recall) measured 2026-08-20
    expected = {"sf0.001": (7, 1 / 7), "sf0.01": (14, 2 / 14)}
    for sf, (n_want, r_want) in expected.items():
        t = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        m = normalize(embedding_matrix(t))
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), 1)
        hit = sims[iu, ju] >= 0.45
        assert int(hit.sum()) == n_want, (sf, int(hit.sum()))
        bucket = (m[:, :6] > 0).astype(np.int64) @ (1 << np.arange(6))
        same = bucket[iu[hit]] == bucket[ju[hit]]
        recall = same.sum() / len(same)
        assert abs(recall - r_want) < 1e-9, (
            f"{sf}: sign-LSH bucket recall {recall:.4f} != pinned "
            f"{r_want:.4f} — bucket function or corpus changed; "
            "re-measure and update the query docstring's contract")


def test_window_hash_rows_matches_naive_reference():
    """window_hash_rows (flat-buffer vectorized) must equal the naive
    per-doc rolling hash: distinct 64-bit polynomial hashes of every
    kgram-byte window."""
    import numpy as np

    from parquet_producers_ray.functions.text import (WINNOW_BASE,
                                                      window_hash_rows)

    K = 5
    docs = ["abcdefghij", "abc", "", "xxxxxxxx", "abcdefghij"]
    t = pa.table({"doc_id": pa.array(list(range(len(docs))), pa.int64()),
                  "text": pa.array(docs)})
    got = window_hash_rows(t, kgram=K)
    got_set = set(zip(got.column("doc_id").to_pylist(),
                      got.column("h").to_pylist()))

    want = set()
    for i, d in enumerate(docs):
        b = d.encode()
        for p in range(len(b) - K + 1):
            h = np.uint64(0)
            with np.errstate(over="ignore"):
                for c in b[p:p + K]:
                    h = h * WINNOW_BASE + np.uint64(c)
            want.add((i, int(h.view(np.int64))))
    assert got_set == want
    # doc shorter than K and empty doc contribute nothing
    assert not any(d in (1, 2) for d, _ in got_set)
    # identical docs produce identical hash sets
    assert {h for d, h in got_set if d == 0} == \
        {h for d, h in got_set if d == 4}


def test_connected_components_at_scale_path_collapsed_labels(ray_session):
    """Regression: the past-broadcast-threshold join path crashed when
    distinct labels fell below the partition count (late rounds of a
    giant component) because raw Ray joins reject zero-row partition
    sides.  Force the at-scale path (broadcast_threshold=0) on a graph
    that collapses to ONE component and assert the labels."""
    import ray.data

    from parquet_producers_ray.functions.graph import connected_components

    # a single chain 0-1-2-...-9: one component, min id 0
    edges = pa.table({"src": pa.array(list(range(9)), pa.int64()),
                      "dst": pa.array(list(range(1, 10)), pa.int64())})
    out = connected_components(ray.data.from_arrow(edges),
                               num_partitions=8,
                               broadcast_threshold=0).to_pandas()
    assert sorted(out["node"]) == list(range(10))
    assert set(out["component"]) == {0}


def test_embedding_matrix_rejects_null_and_ragged():
    """Regression: a null/short embedding shifted every later row in
    the flattened buffer; when the total still divided evenly the
    reshape silently misaligned ALL rows.  Both now raise."""
    import pytest as _pytest

    from parquet_producers_ray.functions.similarity import embedding_matrix

    nulled = pa.table({"embedding": pa.array(
        [[1.0, 0.0, 0.0, 0.0], None, [0.0, 1.0, 0.0, 0.0],
         [0.0, 0.0, 1.0, 0.0]], pa.list_(pa.float32()))})
    with _pytest.raises(ValueError, match="null"):
        embedding_matrix(nulled)
    ragged = pa.table({"embedding": pa.array(
        [[1.0, 2.0], [3.0, 4.0, 5.0], [6.0]], pa.list_(pa.float32()))})
    with _pytest.raises(ValueError, match="ragged"):
        embedding_matrix(ragged)


def test_minhash_verify_vectorized_differential():
    """Round-5 kernelization pin (VERDICT item 1): the cc
    pair_intersect kernel and the padded-matrix NumPy fallback must
    both reproduce the retired per-pair loop (frombuffer +
    intersect1d per candidate) exactly — across uniform, ragged,
    empty-half and threshold-tie shapes."""
    import numpy as np
    import pyarrow as pa

    from parquet_producers_ray.codecs import _native
    from parquet_producers_ray.pipelines.queries import (
        _MINHASH_EDGE, _minhash_verify_fn, _pair_intersect_np)

    def make(npair, G, seed, ragged):
        rng = np.random.default_rng(seed)
        ia = np.repeat(np.arange(npair, dtype=np.int64), 2)
        grams = []
        for _ in range(npair):
            g = G if not ragged else int(rng.integers(0, G))
            a = np.unique(rng.integers(0, 1 << 64, max(g, 1),
                                       dtype=np.uint64))
            b = a.copy()
            nmut = int(rng.integers(0, max(len(a) // 2, 1)))
            if nmut:
                b[:nmut] = rng.integers(0, 1 << 64, nmut, dtype=np.uint64)
            b = np.unique(b)
            if ragged and rng.random() < 0.1:
                a = a[:0]                     # empty half
            grams.append(np.sort(a).tobytes())
            grams.append(np.sort(b).tobytes())
        return pa.table({
            "id_a": pa.array(ia), "id_b": pa.array(ia + 10**6),
            "side": pa.array(np.tile([0, 1], npair).astype(np.int8)),
            "grams": pa.array(grams, pa.large_binary())})

    def loop_reference(b, t_num, t_den):
        b = b.sort_by([("id_a", "ascending"), ("id_b", "ascending"),
                       ("side", "ascending")])
        ia = b.column("id_a").to_numpy(zero_copy_only=False)
        ib = b.column("id_b").to_numpy(zero_copy_only=False)
        side = b.column("side").to_numpy(zero_copy_only=False)
        first = np.ones(len(ia), dtype=bool)
        first[1:] = (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])
        lead = np.flatnonzero(first)
        ok = (lead + 1 < len(ia)) & (side[lead] == 0)
        ok &= np.where(lead + 1 < len(ia),
                       side[np.minimum(lead + 1, len(ia) - 1)] == 1,
                       False)
        src, dst = [], []
        grams = b.column("grams").to_pylist()
        for k in lead[ok]:
            a = np.frombuffer(grams[k], dtype=np.uint64)
            c = np.frombuffer(grams[k + 1], dtype=np.uint64)
            inter = len(np.intersect1d(a, c, assume_unique=True))
            union = len(a) + len(c) - inter
            if union > 0 and t_den * inter >= t_num * union:
                src.append(ia[k])
                dst.append(ib[k])
        return pa.table([pa.array(src, pa.int64()),
                         pa.array(dst, pa.int64())],
                        schema=_MINHASH_EDGE)

    assert _native.available()   # the cc kernel must build here
    fn = _minhash_verify_fn(7, 10)
    for npair, G, seed, ragged in [(500, 64, 1, False), (500, 40, 2, True),
                                   (64, 3, 3, True), (1, 1, 4, False)]:
        t = make(npair, G, seed, ragged)
        assert fn(t).equals(loop_reference(t, 7, 10))

    # C kernel == NumPy fallback on the raw-ragged form
    rng = np.random.default_rng(9)
    lens = rng.integers(0, 50, 400)
    rows = [np.unique(rng.integers(0, 1 << 64, l, dtype=np.uint64))
            for l in lens]
    offs = np.zeros(len(rows) + 1, np.int64)
    offs[1:] = np.cumsum([len(r) for r in rows])
    data = np.concatenate([r for r in rows]) if offs[-1] \
        else np.empty(0, np.uint64)
    rows0 = np.arange(0, len(rows) - 1, 2, dtype=np.int64)
    got_c = _native.pair_intersect(data, offs, rows0)
    got_np = _pair_intersect_np(data, offs, rows0)
    assert (got_c == got_np).all()

    # threshold tie is INCLUSIVE on both paths: J == 7/10 exactly
    a = np.arange(1, 9, dtype=np.uint64)              # 8 elems
    b = np.concatenate([np.arange(2, 9, dtype=np.uint64),
                        np.array([100, 101], np.uint64)])  # 9, inter 7
    t = pa.table({"id_a": pa.array([5, 5], pa.int64()),
                  "id_b": pa.array([6, 6], pa.int64()),
                  "side": pa.array([0, 1], pa.int8()),
                  "grams": pa.array([a.tobytes(), np.sort(b).tobytes()],
                                    pa.large_binary())})
    assert fn(t).num_rows == 1          # 7/17-union → J = 7/10 kept


def test_bpe_pinned_merges_reproduce(sf_dir):
    """Retraining on the sf0.001 sample must reproduce the pinned
    merge table bit-for-bit (train_bpe's determinism contract — the
    SQL oracle embeds this exact table)."""
    import os
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from parquet_producers_ray.functions.text import (BPE_WORD_RE,
                                                      PINNED_BPE_MERGES,
                                                      train_bpe)

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["text"])
    wc = Counter()
    rx = re.compile(BPE_WORD_RE)
    for txt in t.column("text").to_pylist():
        wc.update(rx.findall(txt.lower()))
    assert train_bpe(dict(wc), 48) == PINNED_BPE_MERGES


def test_bpe_segment_matches_one_merge_at_a_time():
    """Property pin for the oracle-equivalence argument: GPT-2-order
    application (merge ALL occurrences of the lowest-ranked present
    pair) must equal the SQL oracle's one-merge-per-step semantics
    (leftmost occurrence of the lowest-ranked pair, iterated), for
    random words AND random merge tables — including tables with
    overlapping/chainable pairs ('aa' cases)."""
    import random

    from parquet_producers_ray.functions.text import (bpe_segment,
                                                      train_bpe)

    def one_at_a_time(word, ranks):
        toks = list(word)
        while True:
            best = None
            bi = None
            for i in range(len(toks) - 1):
                r = ranks.get((toks[i], toks[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if bi is None:
                return tuple(toks)
            toks[bi:bi + 2] = [toks[bi] + toks[bi + 1]]

    rng = random.Random(11)
    alpha = "abcd"
    for trial in range(200):
        words = ["".join(rng.choice(alpha)
                         for _ in range(rng.randint(1, 12)))
                 for _ in range(30)]
        wc = {w: rng.randint(1, 50) for w in words}
        merges = train_bpe(wc, rng.randint(1, 30))
        ranks = {p: i for i, p in enumerate(merges)}
        for w in words + ["aaaaaaa", "abababa", ""]:
            assert bpe_segment(w, ranks) == one_at_a_time(w, ranks), \
                (trial, w, merges)


def test_bpe_real_token_counts_matches_slow_reference():
    """Vectorized+cached corpus path == naive per-doc reference."""
    import re

    from parquet_producers_ray.functions.text import (BpeCounter,
                                                      bpe_real_token_counts)

    docs = ["Key VALUE merge, sort; 123 window!!", "",
            "spark spark spark", "??!!", "a", "The-Quick_Brown fox"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    got = bpe_real_token_counts(t).column("n_bpe_tokens").to_pylist()
    c = BpeCounter()
    want = [sum(c.count(w) for w in re.findall("[a-z]+", d.lower()))
            for d in docs]
    assert got == want


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn support (round 5): restart-marker streams decode
    IDENTICALLY to their unrestarted twins — predictors reset at each
    boundary, reader byte-aligns over the marker — for grayscale
    (non-interleaved data-unit accounting) and both color layouts
    (MCU accounting), across interval sizes incl. 1."""
    from parquet_producers_ray.stages.jpeg import JpegCodec

    rng = np.random.RandomState(9)
    g = rng.randint(0, 256, size=(37, 53)).astype(np.uint8)
    ref = JpegCodec.decode_pixels(JpegCodec.encode(g, 95))
    for ri in (1, 2, 5, 7, 1000):
        blob = JpegCodec.encode(g, 95, restart_interval=ri)
        assert np.array_equal(JpegCodec.decode_pixels(blob), ref), ri

    c = rng.randint(0, 256, size=(33, 49, 3)).astype(np.uint8)
    for ss in ("420", "444"):
        ref = JpegCodec.decode_pixels(JpegCodec.encode(c, 95, ss))
        for ri in (1, 3):
            blob = JpegCodec.encode(c, 95, ss, restart_interval=ri)
            assert np.array_equal(JpegCodec.decode_pixels(blob), ref), \
                (ss, ri)


def test_jpeg_scan_kernel_matches_python(monkeypatch):
    """The cc jpeg_decode_scan fast path must be bit-identical to the
    pure-Python entropy decoder across gray/420/444 layouts, restart
    intervals, and thumbnail sizes (same differential contract as the
    FSST and pair_intersect kernels)."""
    from parquet_producers_ray.codecs import _native
    from parquet_producers_ray.stages.jpeg import JpegCodec

    assert _native.available()
    rng = np.random.RandomState(21)
    blobs = []
    for (h, w) in [(1, 1), (8, 8), (23, 41)]:
        px = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        blobs.append(JpegCodec.encode(px, 95))
        blobs.append(JpegCodec.encode(px, 95, restart_interval=2))
    for ss in ("420", "444"):
        px = rng.randint(0, 256, size=(19, 30, 3)).astype(np.uint8)
        blobs.append(JpegCodec.encode(px, 90, ss))
        blobs.append(JpegCodec.encode(px, 90, ss, restart_interval=1))
    fast = [JpegCodec.decode_pixels(b) for b in blobs]
    monkeypatch.setattr(_native, "available", lambda: False)
    slow = [JpegCodec.decode_pixels(b) for b in blobs]
    for a, b in zip(fast, slow):
        assert np.array_equal(a, b)


def test_jpeg_encode_kernel_matches_python(monkeypatch):
    """The cc jpeg_encode_scan fast path must be BYTE-identical to the
    pure-Python bit writer across layouts and restart intervals."""
    from parquet_producers_ray.codecs import _native
    from parquet_producers_ray.stages.jpeg import JpegCodec

    assert _native.available()
    rng = np.random.RandomState(23)
    cases = []
    for (h, w) in [(1, 1), (8, 8), (23, 41)]:
        px = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        for ri in (0, 2):
            cases.append((px, {"restart_interval": ri}))
    for ss in ("420", "444"):
        px = rng.randint(0, 256, size=(19, 30, 3)).astype(np.uint8)
        for ri in (0, 1):
            cases.append((px, {"subsampling": ss,
                               "restart_interval": ri}))
    fast = [JpegCodec.encode(px, 95, **kw) for px, kw in cases]
    monkeypatch.setattr(_native, "available", lambda: False)
    slow = [JpegCodec.encode(px, 95, **kw) for px, kw in cases]
    assert all(a == b for a, b in zip(fast, slow))


def test_gif_lzw_kernel_matches_python(monkeypatch):
    """cc gif_lzw_encode/decode fast paths are byte-identical to the
    Python Appendix-F implementation — empty/tiny inputs, deep-table
    runs, table-fill CLEAR resets and the cScSc case included."""
    from parquet_producers_ray.codecs import _native
    from parquet_producers_ray.stages import multimodal as M

    assert _native.available()
    rng = np.random.RandomState(6)
    cases = [rng.randint(0, 256, size=n).astype(np.uint8)
             for n in (0, 1, 5, 3072, 20000)]
    cases.append(np.zeros(10000, np.uint8))          # cScSc-heavy runs
    cases.append(np.tile(np.arange(256, dtype=np.uint8), 40))
    fast_enc = [M._lzw_encode_gif(px) for px in cases]
    fast_dec = [M._lzw_decode_gif(e) for e in fast_enc]
    monkeypatch.setattr(_native, "available", lambda: False)
    slow_enc = [M._lzw_encode_gif(px) for px in cases]
    slow_dec = [M._lzw_decode_gif(e) for e in fast_enc]
    for px, fe, se, fd, sd in zip(cases, fast_enc, slow_enc,
                                  fast_dec, slow_dec):
        assert fe == se
        assert np.array_equal(fd, px) and np.array_equal(sd, px)


def test_png_color_types_decode():
    """Round-5 PNG generalization: 8-bit truecolor (2), palette (3,
    PLTE-expanded), gray+alpha (4) and RGBA (6) decode alongside the
    original grayscale path; RGB round-trips through our encoder with
    all five filters exercised."""
    import struct
    import zlib

    from parquet_producers_ray.stages.multimodal import (PNG_SIG,
                                                         PngCodec)

    rng = np.random.RandomState(8)
    g = rng.randint(0, 256, size=(23, 31)).astype(np.uint8)
    assert np.array_equal(PngCodec.decode_pixels(PngCodec.encode(g)), g)
    c = rng.randint(0, 256, size=(17, 29, 3)).astype(np.uint8)
    assert np.array_equal(PngCodec.decode_pixels(PngCodec.encode(c)), c)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    def build(w, h, ctype, payload, plte=None):
        out = PNG_SIG + chunk(b"IHDR", struct.pack(
            ">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        if plte is not None:
            out += chunk(b"PLTE", plte.tobytes())
        return out + chunk(b"IDAT", zlib.compress(payload)) \
            + chunk(b"IEND", b"")

    w, h = 9, 4
    idx = rng.randint(0, 16, size=(h, w)).astype(np.uint8)
    plte = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    payload = b"".join(b"\x00" + idx[r].tobytes() for r in range(h))
    assert np.array_equal(
        PngCodec.decode_pixels(build(w, h, 3, payload, plte)), plte[idx])
    rgba = rng.randint(0, 256, size=(h, w, 4)).astype(np.uint8)
    payload = b"".join(
        b"\x02" + ((rgba[r].astype(np.int16).reshape(-1)
                    - (rgba[r - 1].astype(np.int16).reshape(-1)
                       if r else 0)) % 256).astype(np.uint8).tobytes()
        for r in range(h))
    assert np.array_equal(
        PngCodec.decode_pixels(build(w, h, 6, payload)), rgba)
    ga = rng.randint(0, 256, size=(h, w, 2)).astype(np.uint8)
    payload = b"".join(b"\x00" + ga[r].tobytes() for r in range(h))
    assert np.array_equal(
        PngCodec.decode_pixels(build(w, h, 4, payload)), ga)


def test_wav_codec_real_corpus_variants():
    """Round-5 WAV coverage: stereo/8-bit files written by the stdlib
    ``wave`` module decode correctly (independent writer), float32 and
    24-bit PCM decode per spec, all normalized to the int16 mono
    contract the audio stages consume."""
    import io
    import struct
    import wave as pywave

    from parquet_producers_ray.stages.multimodal import WavCodec

    rng = np.random.RandomState(3)
    s16 = rng.randint(-30000, 30000, size=500).astype(np.int16)
    r, back = WavCodec.decode(WavCodec.encode(16000, s16))
    assert r == 16000 and np.array_equal(back, s16)

    st = rng.randint(-30000, 30000, size=(400, 2)).astype(np.int16)
    buf = io.BytesIO()
    w = pywave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(44100)
    w.writeframes(st.reshape(-1).astype("<i2").tobytes())
    w.close()
    r, back = WavCodec.decode(buf.getvalue())
    want = (st.astype(np.int32).sum(axis=1) // 2).astype(np.int16)
    assert r == 44100 and np.array_equal(back, want)

    s8 = rng.randint(0, 256, size=301).astype(np.uint8)
    buf = io.BytesIO()
    w = pywave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(1)
    w.setframerate(8000)
    w.writeframes(s8.tobytes())
    w.close()
    r, back = WavCodec.decode(buf.getvalue())
    assert np.array_equal(back, (s8.astype(np.int16) - 128) << 8)

    f = (rng.rand(200) * 2 - 1).astype("<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 48000, 48000 * 4, 4, 32)
    data = f.tobytes()
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    r, back = WavCodec.decode(
        b"RIFF" + struct.pack("<I", len(body)) + body)
    assert np.array_equal(back, np.clip(
        np.round(f.astype(np.float64) * 32767), -32768,
        32767).astype(np.int16))

    v24 = rng.randint(-(1 << 23), 1 << 23, size=100).astype(np.int32)
    raw = b"".join(int(x & 0xFFFFFF).to_bytes(3, "little") for x in v24)
    fmt = struct.pack("<HHIIHH", 1, 1, 22050, 22050 * 3, 3, 24)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    r, back = WavCodec.decode(
        b"RIFF" + struct.pack("<I", len(body)) + body)
    assert np.array_equal(back, (v24 >> 8).astype(np.int16))


def test_jpeg_progressive_roundtrip():
    """PROGRESSIVE (SOF2) support pin: encode_progressive carries the
    same quantized coefficients as encode, so decode of the two
    streams must be BIT-IDENTICAL — across sizes, qualities, gray and
    both color subsamplings.  This closes the last huffman-JPEG
    boundary (arithmetic/lossless remain lib-backed)."""
    from parquet_producers_ray.stages.jpeg import JpegCodec

    rng = np.random.RandomState(17)
    for (h, w) in [(1, 1), (8, 8), (8, 16), (23, 41), (37, 53)]:
        for q in (50, 95, 100):
            g = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
            assert np.array_equal(
                JpegCodec.decode_pixels(JpegCodec.encode_progressive(g, q)),
                JpegCodec.decode_pixels(JpegCodec.encode(g, q))), (h, w, q)
    for ss in ("420", "444"):
        for q in (85, 100):
            c = rng.randint(0, 256, size=(21, 37, 3)).astype(np.uint8)
            assert np.array_equal(
                JpegCodec.decode_pixels(
                    JpegCodec.encode_progressive(c, q, ss)),
                JpegCodec.decode_pixels(JpegCodec.encode(c, q, ss))), \
                (ss, q)
    # a smooth gradient at q100 is exact end-to-end
    gr = (np.linspace(0, 255, 64)[None, :]
          * np.ones((32, 1))).astype(np.uint8)
    assert np.array_equal(
        JpegCodec.decode_pixels(JpegCodec.encode_progressive(gr, 100)),
        gr)


def test_jpeg_progressive_ac_scan_fuzz():
    """Coefficient-level fuzz of the AC first+refine scan pair — the
    trickiest progressive machinery (EOB-run-includes-current-block,
    eager ZRL flushes with buffered correction bits): 400 random
    sparse/dense multi-block bands must round-trip exactly."""
    import parquet_producers_ray.stages.jpeg as J

    def roundtrip(zz):
        n = len(zz)
        ac_enc = J._build_huffman(J.AC_BITS, J.AC_VALS)
        b1 = J._BitWriter()
        J._ProgressiveEncoder(b1, [None], [ac_enc]).ac_first(
            zz, list(range(n)), 0, 1, 63, 1)
        b1.flush()
        b2 = J._BitWriter()
        J._ProgressiveEncoder(b2, [None], [ac_enc]).ac_refine(
            zz, list(range(n)), 0, 1, 63, 0)
        b2.flush()
        comps, dims = [(1, 1, 1, 0)], [(1, n)]
        zzs = [np.zeros((n, 64), np.int32)]
        huff = {(1, 0): J._huff_lut(J.AC_BITS, J.AC_VALS)}
        J._decode_prog_scan(bytes(b1.out) + b"\xFF\xD9", 0,
                            [(0, 0, 0)], 1, 63, 0, 1, comps, dims,
                            zzs, huff, 0, n * 8, 8, n, 1)
        J._decode_prog_scan(bytes(b2.out) + b"\xFF\xD9", 0,
                            [(0, 0, 0)], 1, 63, 1, 0, comps, dims,
                            zzs, huff, 0, n * 8, 8, n, 1)
        return zzs[0]

    rng = np.random.RandomState(11)
    for trial in range(400):
        n = int(rng.randint(1, 5))
        zz = np.zeros((n, 64), np.int32)
        for b in range(n):
            nnz = int(rng.randint(0, 40 if trial % 3 else 8))
            pos = rng.choice(np.arange(1, 64), size=nnz, replace=False)
            v = rng.randint(-9, 10, nnz)
            v[v == 0] = 1
            zz[b, pos] = v
        tgt = zz.copy()
        tgt[:, 0] = 0
        assert np.array_equal(roundtrip(zz.copy()), tgt), trial


def test_wav_ima_adpcm_matches_audioop():
    """IMA/DVI ADPCM (WAV format tag 0x11): block decode must be
    BIT-identical to stdlib audioop's DVI-ADPCM (independent
    implementation of the same public tables; audioop packs high
    nibble first, WAV low-first — swapped in the reference), for
    mono AND stereo (round-robin 4-byte words, downmixed like PCM)."""
    import struct
    import warnings

    from parquet_producers_ray.stages.multimodal import (_IMA_INDEX,
                                                         _IMA_STEP,
                                                         WavCodec)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import audioop

    def enc_block(samples, pred, idx):
        nibs = []
        for s_ in samples:
            step = _IMA_STEP[idx]
            diff = s_ - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            if nib & 8:
                d = -d
            pred = max(-32768, min(32767, pred + d))
            idx = max(0, min(88, idx + _IMA_INDEX[nib & 7]))
            nibs.append(nib)
        by = bytes(nibs[i] | (nibs[i + 1] << 4)
                   for i in range(0, len(nibs), 2))
        return by, idx

    def wav(fmt_body, data):
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_body))
                + fmt_body + b"data" + struct.pack("<I", len(data))
                + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rng = np.random.RandomState(5)

    # mono, 2 blocks
    sig = np.cumsum(rng.randint(-800, 800, size=130)).clip(
        -30000, 30000).astype(np.int16)
    ba = 4 + 32
    data = bytearray()
    idx = 0
    ref = []
    for p in (0, 65):
        pred = int(sig[p])
        nb, idx_out = enc_block([int(x) for x in sig[p + 1:p + 65]],
                                pred, idx)
        data += struct.pack("<hBB", pred, idx, 0) + nb
        swapped = bytes(((b & 0xF) << 4) | (b >> 4) for b in nb)
        lin, _ = audioop.adpcm2lin(swapped, 2, (pred, idx))
        ref.append(pred)
        ref.extend(np.frombuffer(lin, "<i2").tolist())
        idx = idx_out
    fmt = struct.pack("<HHIIHH", 17, 1, 8000, 4000, ba, 4)
    r, out = WavCodec.decode(wav(fmt, bytes(data)))
    assert r == 8000 and np.array_equal(out, np.array(ref, np.int16))

    # stereo, 1 block: per-channel headers then round-robin words
    l_ = np.cumsum(rng.randint(-500, 500, size=65)).clip(
        -30000, 30000).astype(np.int16)
    r_ = np.cumsum(rng.randint(-500, 500, size=65)).clip(
        -30000, 30000).astype(np.int16)
    nbl, _ = enc_block([int(x) for x in l_[1:]], int(l_[0]), 0)
    nbr, _ = enc_block([int(x) for x in r_[1:]], int(r_[0]), 0)
    data = bytearray(struct.pack("<hBB", int(l_[0]), 0, 0)
                     + struct.pack("<hBB", int(r_[0]), 0, 0))
    for i in range(0, len(nbl), 4):
        data += nbl[i:i + 4] + nbr[i:i + 4]
    ba2 = 8 + len(nbl) + len(nbr)
    fmt = struct.pack("<HHIIHH", 17, 2, 8000, 8000, ba2, 4)
    r2, out2 = WavCodec.decode(wav(fmt, bytes(data)))
    refL = [int(l_[0])]
    swapped = bytes(((b & 0xF) << 4) | (b >> 4) for b in nbl)
    refL += np.frombuffer(audioop.adpcm2lin(
        swapped, 2, (int(l_[0]), 0))[0], "<i2").tolist()
    refR = [int(r_[0])]
    swapped = bytes(((b & 0xF) << 4) | (b >> 4) for b in nbr)
    refR += np.frombuffer(audioop.adpcm2lin(
        swapped, 2, (int(r_[0]), 0))[0], "<i2").tolist()
    want = ((np.array(refL, np.int32) + np.array(refR, np.int32))
            // 2).astype(np.int16)
    assert np.array_equal(out2, want)


def test_png_color_recon_stage_exact():
    """media_png_color's stage contract: truecolor PNG is LOSSLESS, so
    the decode equals the closed-form source bit-for-bit and the
    channel sums match a direct computation."""
    from parquet_producers_ray.stages.multimodal import (
        PngColorReconStage, _color_png_source,
        synthesize_png_color_column)

    docs = pa.table({"doc_id": pa.array([3, 70, 113], pa.int64()),
                     "text": ["abc def " * 30, "", "zzz!" * 99]})
    blobs = synthesize_png_color_column(docs)
    blobs = blobs.append_column("text", docs.column("text"))
    out = PngColorReconStage()(blobs).to_pylist()
    for row in out:
        i = row["doc_id"]
        src = _color_png_source(
            int(i), docs.column("text")[
                docs.column("doc_id").to_pylist().index(i)].as_py())
        assert row["exact"] is True
        assert row["width"] == i % 32 + 8
        assert row["height"] == i % 20 + 8
        s = src.astype(np.int64).sum(axis=(0, 1))
        assert (row["r_sum"], row["g_sum"], row["b_sum"]) == \
            (int(s[0]), int(s[1]), int(s[2]))
