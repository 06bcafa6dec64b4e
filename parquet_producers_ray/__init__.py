"""parquet_producers_ray — a Ray-Data-native columnar processing engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of ``danielearwicker/Parquet.Producers`` (keyed
sort-then-produce over Parquet with incremental updates, versioned
outputs and per-stage lineage — see SURVEY.md), extended with an
explicit per-column lightweight-compression layer (dictionary, RLE,
FSST, bit-packing, frame-of-reference with per-partition sampling-based
codec auto-selection) and the large-scale training-data operators
(dedup, similarity search, text analysis).

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines,
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, ``groupby``/``sort`` shuffles for the wide steps.
"""

__version__ = "0.1.0"
