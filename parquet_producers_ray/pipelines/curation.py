"""Raw crawl → curated encoded store, as ONE composed streaming
pipeline: text extraction → language-ID fill → quality filter → exact
dedup → flagship columnar encode.

This is the end-to-end shape the engine exists for: a WARC/WET/JSONL
crawl lands with `html` populated and `text`/`lang` null
(sources/ingest.py), this pipeline fills and filters them with the
registry's curation kernels (functions/text.py — all vectorized Arrow,
zero Python rows), collapses exact duplicates, and persists the
survivors through the flagship's url-keyed encode
(pipelines/flagship.py: codec auto-selection, sorted partitions,
lineage manifests, resume).

Exchange budget over the corpus: exactly TWO — the digest-keyed dedup
groupby and the url-keyed encode exchange (both storage-backed by the
flagship default).  Extraction, lang-ID and quality scoring are
shuffle-free map stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import (extract_text_from_html, fnv1a_hash,
                              langid_scores, quality_scores)
from .flagship import encode_pipeline


def prepare_webpages(batch: pa.Table) -> pa.Table:
    """Fill `text` from `html` (where null) and `lang` from the
    marker-based language-ID (where null) — the extraction pass a raw
    WARC crawl needs before any text-keyed curation."""
    text = batch.column("text")
    if text.null_count > 0 and "html" in batch.column_names:
        html = batch.column("html")
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        extracted = extract_text_from_html(html)
        text = pc.coalesce(text, extracted)
        batch = batch.set_column(
            batch.column_names.index("text"), "text", text)
    lang = batch.column("lang")
    if lang.null_count > 0:
        pred = langid_scores(batch).column("lang_pred")
        batch = batch.set_column(
            batch.column_names.index("lang"), "lang",
            pc.coalesce(lang, pred))
    return batch


def curate_encode_pipeline(ds, out_dir: str, *, min_tokens: int = 30,
                           min_stop: float = 0.0,
                           langs: list | None = None,
                           num_buckets: int | None = None,
                           resume: bool = True):
    """Curate a canonical webpage Dataset and encode the survivors.

    Filters: token count ≥ `min_tokens`, stopword ratio ≥ `min_stop`,
    optional language allow-list; then exact dedup on the text digest
    (keeper = smallest url, deterministic across runs/partitionings).
    Returns the encode manifests Dataset (small)."""

    def score_filter(b: pa.Table) -> pa.Table:
        b = prepare_webpages(b)
        if langs:
            b = b.filter(pc.is_in(b.column("lang"),
                                  value_set=pa.array(langs)))
        if b.num_rows == 0:
            return b.append_column("_digest", pa.array([], pa.int64()))
        q = quality_scores(b)
        keep = pc.greater_equal(q.column("n_tokens"),
                                pa.scalar(min_tokens, pa.int64()))
        if min_stop > 0:
            keep = pc.and_(keep, pc.greater_equal(
                q.column("stopword_ratio"),
                pa.scalar(min_stop, pa.float64())))
        b = b.filter(keep)
        return b.append_column("_digest", pa.array(
            fnv1a_hash(b.column("text")).astype(np.int64)))

    def keep_first(g: pa.Table) -> pa.Table:
        # deterministic keeper: smallest url (stable across runs and
        # partitionings, unlike first-seen)
        return g.sort_by("url").slice(0, 1).drop_columns(["_digest"])

    curated = (ds.map_batches(score_filter, batch_format="pyarrow")
               .groupby("_digest")
               .map_groups(keep_first, batch_format="pyarrow"))
    return encode_pipeline(curated, out_dir, num_buckets=num_buckets,
                           resume=resume)
