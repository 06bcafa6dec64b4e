"""CLI entry point, suitable for ``ray job submit -- python
run_pipeline.py encode <input> <output>``.

Subcommands:
  encode <input_parquet_dir_or_file> <out_dir> [--buckets N] [--no-resume]
      Flagship url-keyed columnar encode with per-partition lineage
      manifests (re-running skips completed partitions).
  decode-verify <encoded_dir> <input>      Decode everything back and
      assert row-count parity (bit-identity is covered per partition by
      the codec layer and tests).
  lookup <encoded_dir> <key> [<key> ...] [--columns a,b]
      Point lookup: partition-pruned (bucket id is a pure function of
      the key) and column-pruned (row-group-per-column store); prints
      the matching rows as JSON lines.
  mirror-bootstrap <input> <root>          Versioned incremental mirror v1.
  mirror-delta <root> <delta_parquet> <based_on_version>
      Apply one delta wave; prints partitions rewritten/linked.
  mirror-compact <root> <based_on_version>
      Merge adjacent undersized partitions into version based_on+1.
  mirror-info <root>
      Per-version inventory (partitions/rows/bytes/feed; no Ray session).
  mirror-prune <root> --keep-from N [--keep-feeds]
      Retention GC: delete versions < N (hardlink-aware, no Ray session).
"""

from __future__ import annotations

import argparse
import json


def _init():
    import ray
    if not ray.is_initialized():
        # No explicit address: ray.init() honours RAY_ADDRESS, so the
        # same script runs standalone (RAY_ADDRESS=local / unset) and
        # under `ray job submit` on a real cluster (address injected).
        ray.init(include_dashboard=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("encode")
    e.add_argument("input")
    e.add_argument("out")
    e.add_argument("--buckets", type=int, default=None)
    e.add_argument("--key", default="url")
    e.add_argument("--no-resume", action="store_true")
    e.add_argument("--format", default="parquet",
                   choices=["parquet", "jsonl", "csv", "wet", "warc"])
    e.add_argument("--exchange", default="storage",
                   choices=["storage", "object_store"],
                   help="all-to-all backend: storage spills (shuffle-"
                        "service pattern; needs out_dir on shared "
                        "storage multi-node) or Ray's object-store "
                        "hash repartition")
    e.add_argument("--shuffle-compression", default=None,
                   choices=["zstd"],
                   help="object_store exchange only: pack per-bucket "
                        "rows into zstd'd Arrow IPC blobs before the "
                        "exchange (use on multi-node clusters where "
                        "the shuffle crosses a network)")
    e.add_argument("--zstd-level", type=int, default=9,
                   help="segment-store zstd level (9 default: ~11%% "
                        "smaller than zstd-3 for ~0.8 s/partition of "
                        "off-critical-path CPU)")
    d = sub.add_parser("decode-verify")
    d.add_argument("encoded")
    d.add_argument("input")
    lk = sub.add_parser("lookup")
    lk.add_argument("encoded")
    lk.add_argument("keys", nargs="+")
    lk.add_argument("--columns", default=None)
    vf = sub.add_parser("verify")
    vf.add_argument("encoded")
    rc = sub.add_parser("recompress")
    rc.add_argument("src")
    rc.add_argument("out")
    rc.add_argument("--no-resume", action="store_true")
    inf = sub.add_parser("info")
    inf.add_argument("encoded")
    mb = sub.add_parser("mirror-bootstrap")
    mb.add_argument("input")
    mb.add_argument("root")
    mb.add_argument("--no-feed", action="store_true",
                    help="skip bootstrap feed emission (the 10^12-row "
                         "initial-load path; consumers read content "
                         "directly, later deltas still emit feeds)")
    md = sub.add_parser("mirror-delta")
    md.add_argument("root")
    md.add_argument("delta")
    md.add_argument("based_on", type=int)
    mc = sub.add_parser(
        "mirror-compact",
        help="merge adjacent undersized partitions (after delete-heavy "
             "waves) into a new version; full partitions hardlink")
    mc.add_argument("root")
    mc.add_argument("based_on", type=int)
    mi = sub.add_parser("mirror-info",
                        help="per-version inventory (pure metadata "
                             "read, no Ray session)")
    mi.add_argument("root")
    mp = sub.add_parser(
        "mirror-prune",
        help="retention GC: delete mirror versions below --keep-from "
             "(hardlink-aware — bytes shared with surviving versions "
             "stay); the newest version is never deleted")
    mp.add_argument("root")
    mp.add_argument("--keep-from", type=int, required=True)
    mp.add_argument("--keep-feeds", action="store_true",
                    help="keep update-feed dirs (CDC consumers not "
                         "caught up yet)")
    ce = sub.add_parser(
        "curate-encode",
        help="raw crawl -> curated encoded store: extract text from "
             "html, fill lang by marker language-ID, quality-filter, "
             "exact-dedup, flagship encode")
    ce.add_argument("input")
    ce.add_argument("out")
    ce.add_argument("--format", default="warc",
                    choices=["parquet", "jsonl", "csv", "wet", "warc"])
    ce.add_argument("--buckets", type=int, default=None)
    ce.add_argument("--min-tokens", type=int, default=30)
    ce.add_argument("--min-stop", type=float, default=0.0)
    ce.add_argument("--langs", default=None,
                    help="comma-separated allow-list, e.g. en,de")
    ce.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()
    if args.cmd not in ("lookup", "info", "mirror-prune", "mirror-info"):
        _init()   # lookup/info/prune are pure client ops — no Ray session

    if args.cmd == "encode":
        from parquet_producers_ray.pipelines.flagship import (
            encode_pipeline, read_input, summarize)
        if args.format == "parquet":
            ds = read_input(args.input)
        else:
            from parquet_producers_ray.sources import ingest
            reader = {"jsonl": ingest.read_webpages_jsonl,
                      "csv": ingest.read_webpages_csv,
                      "wet": ingest.read_webpages_wet,
                      "warc": ingest.read_webpages_warc}[args.format]
            ds = reader(args.input)
        if args.key not in ds.schema().names:
            ap.error(f"--key {args.key!r} is not a column of the input "
                     f"(schema: {ds.schema().names}); pass --key with "
                     "one of these")
        man = encode_pipeline(ds, args.out, num_buckets=args.buckets,
                              key=args.key, resume=not args.no_resume,
                              shuffle_compression=args.shuffle_compression,
                              exchange=args.exchange,
                              zstd_level=args.zstd_level)
        print(json.dumps(summarize(man.materialize())))
    elif args.cmd == "curate-encode":
        from parquet_producers_ray.pipelines.curation import (
            curate_encode_pipeline)
        from parquet_producers_ray.pipelines.flagship import (
            read_input, summarize)
        if args.format == "parquet":
            ds = read_input(args.input)
        else:
            from parquet_producers_ray.sources import ingest
            reader = {"jsonl": ingest.read_webpages_jsonl,
                      "csv": ingest.read_webpages_csv,
                      "wet": ingest.read_webpages_wet,
                      "warc": ingest.read_webpages_warc}[args.format]
            ds = reader(args.input)
        man = curate_encode_pipeline(
            ds, args.out, min_tokens=args.min_tokens,
            min_stop=args.min_stop,
            langs=args.langs.split(",") if args.langs else None,
            num_buckets=args.buckets, resume=not args.no_resume)
        print(json.dumps(summarize(man.materialize())))
    elif args.cmd == "decode-verify":
        from parquet_producers_ray.pipelines.flagship import (
            decode_pipeline, read_input)
        n_dec = decode_pipeline(args.encoded).count()
        n_in = read_input(args.input).count()
        assert n_dec == n_in, (n_dec, n_in)
        print(json.dumps({"rows": n_dec, "match": True}))
    elif args.cmd == "recompress":
        from parquet_producers_ray.pipelines.flagship import (
            recompress_pipeline, summarize)
        man = recompress_pipeline(args.src, args.out,
                                  resume=not args.no_resume)
        print(json.dumps(summarize(man.materialize())))
    elif args.cmd == "verify":
        from parquet_producers_ray.pipelines.flagship import verify_store
        rows = verify_store(args.encoded).take_all()
        bad = [r for r in rows if not (r["rows_ok"] and r["digest_ok"])]
        print(json.dumps({"partitions": len(rows), "bad": len(bad),
                          "ok": not bad,
                          "bad_parts": [r["part"] for r in bad][:20]}))
        raise SystemExit(0 if not bad else 1)
    elif args.cmd == "info":
        from parquet_producers_ray.engine import manifest as mf
        mans = mf.list_manifests(args.encoded)
        codec_hist: dict = {}
        for m in mans:
            for col, c in (m.get("codecs") or {}).items():
                codec_hist.setdefault(col, {})
                codec_hist[col][c] = codec_hist[col].get(c, 0) + 1
        print(json.dumps({
            "partitions": len(mans),
            "rows": sum(m.get("rows", 0) for m in mans),
            "input_bytes": sum(m.get("input_bytes", 0) for m in mans),
            "stored_bytes": sum(m.get("data_size", 0) for m in mans),
            "codecs": codec_hist,
        }))
    elif args.cmd == "lookup":
        from parquet_producers_ray.pipelines.flagship import lookup
        cols = args.columns.split(",") if args.columns else None
        tbl = lookup(args.encoded, args.keys, columns=cols)
        for row in tbl.to_pylist():
            print(json.dumps({k: (v if not isinstance(v, bytes)
                                  else v.decode("utf-8", "replace"))
                              for k, v in row.items()},
                             default=str))
    elif args.cmd == "mirror-info":
        from parquet_producers_ray.pipelines.incremental import (
            IncrementalMirror, webpage_mirror_spec)
        mirror = IncrementalMirror(args.root, webpage_mirror_spec())
        print(json.dumps(mirror.info()))
    elif args.cmd == "mirror-compact":
        from parquet_producers_ray.pipelines.incremental import (
            IncrementalMirror, webpage_mirror_spec)
        mirror = IncrementalMirror(args.root, webpage_mirror_spec())
        print(json.dumps(mirror.compact(args.based_on)))
    elif args.cmd == "mirror-prune":
        from parquet_producers_ray.pipelines.incremental import (
            IncrementalMirror, webpage_mirror_spec)
        mirror = IncrementalMirror(args.root, webpage_mirror_spec())
        print(json.dumps(mirror.prune(args.keep_from,
                                      keep_feeds=args.keep_feeds)))
    elif args.cmd == "mirror-bootstrap":
        import numpy as np
        import pyarrow as pa

        from parquet_producers_ray.engine.model import UPD_SEQ_COL
        from parquet_producers_ray.pipelines.flagship import read_input
        from parquet_producers_ray.pipelines.incremental import (
            IncrementalMirror, updates_with_type, webpage_mirror_spec)
        mirror = IncrementalMirror(args.root, webpage_mirror_spec())
        ups = read_input(args.input).map_batches(
            lambda b: updates_with_type(b).append_column(
                UPD_SEQ_COL, pa.array(np.zeros(len(b), np.int64))),
            batch_format="pyarrow")
        mirror.bootstrap(ups, 1, emit_feed=not args.no_feed)
        print(json.dumps({"version": 1,
                          "feed": not args.no_feed,
                          "partitions": len(mirror.content.manifest(1)
                                            ["partitions"])}))
    elif args.cmd == "mirror-delta":
        import pyarrow.parquet as pq

        from parquet_producers_ray.engine.model import TYPE_COL
        from parquet_producers_ray.pipelines.incremental import (
            IncrementalMirror, updates_with_type, webpage_mirror_spec)
        mirror = IncrementalMirror(args.root, webpage_mirror_spec())
        delta = pq.read_table(args.delta)
        if TYPE_COL not in delta.column_names:
            # plain webpage rows = an upsert wave (same convenience the
            # bootstrap path applies); pre-typed files pass through so
            # Delete waves remain expressible
            delta = updates_with_type(delta)
        res = mirror.apply(delta, args.based_on)
        print(json.dumps({"version": args.based_on + 1,
                          "rewritten": res["content"]["rewritten"],
                          "linked": res["content"]["linked"],
                          "feed_rows": len(res["feed"])}))


if __name__ == "__main__":
    main()
    import ray
    if ray.is_initialized():
        ray.shutdown()
