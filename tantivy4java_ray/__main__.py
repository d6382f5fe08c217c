"""CLI: build / search / merge / validate / info.

Examples::

    python -m tantivy4java_ray build data/*.parquet /tmp/idx \\
        --text-fields text --num-shards 32
    python -m tantivy4java_ray search /tmp/idx 'hello AND world' -k 10
    python -m tantivy4java_ray merge /tmp/idx_a /tmp/idx_b -o /tmp/idx_m
    python -m tantivy4java_ray validate /tmp/idx
    python -m tantivy4java_ray info /tmp/idx

Owns its Ray session (scripts own sessions; library code never inits).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray() -> None:
    import os

    import ray
    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the running
        # cluster; when it is unset (plain standalone invocation) a
        # throwaway local instance is started instead
        addr = os.environ.get("RAY_ADDRESS", "local")
        kw = {}
        if addr != "local":
            # attaching to a RUNNING cluster (RAY_ADDRESS=auto / a GCS
            # address): cluster workers don't share this client's
            # sys.path, so ship the package itself — the same thing
            # `ray job submit --working-dir` does for a submitted job
            import tantivy4java_ray
            kw["runtime_env"] = {"py_modules": [tantivy4java_ray]}
        ray.init(address=addr, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR", **kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="tantivy4java_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("paths", nargs="+")
    b.add_argument("index_dir")
    b.add_argument("--text-fields", nargs="*", default=["text"])
    b.add_argument("--num-shards", type=int, default=None)
    b.add_argument("--target-docs", type=int, default=100_000)
    b.add_argument("--html-fallback", nargs=2, metavar=("TEXT", "HTML"))

    s = sub.add_parser("search")
    s.add_argument("index_dir")
    s.add_argument("query")
    s.add_argument("-k", "--limit", type=int, default=10)
    s.add_argument("--fields", nargs="*", help="columns to retrieve")
    s.add_argument("--snippet", metavar="FIELD", default=None,
                   help="add a <b>-highlighted best-fragment snippet "
                        "from this field per hit")
    s.add_argument("--snippet-chars", type=int, default=150)

    m = sub.add_parser("merge")
    m.add_argument("inputs", nargs="+")
    m.add_argument("-o", "--out", required=True)
    m.add_argument("--skip-corrupt", action="store_true",
                   help="drop unreadable/truncated inputs with a skip "
                        "record instead of aborting the merge")

    bd = sub.add_parser("bundle", help="pack an index into one .split")
    bd.add_argument("index_dir")
    bd.add_argument("out", help="output .split path (local or URL)")
    bd.add_argument("--include-txlog", action="store_true")

    v = sub.add_parser("validate")
    v.add_argument("index_dir")
    v.add_argument("--deep", action="store_true",
                   help="also re-CRC every artifact against the "
                        "checksums.json sidecar (see `checksum`)")

    ck = sub.add_parser("checksum", help="generate the checksums.json "
                                         "integrity sidecar (one CRC32 "
                                         "streaming pass per artifact)")
    ck.add_argument("index_dir")

    i = sub.add_parser("info")
    i.add_argument("index_dir")
    i.add_argument("--sizes", action="store_true",
                   help="include per-field component byte sizes "
                        "(getPerFieldComponentSizes analog)")

    a = sub.add_parser("agg", help="run an aggregation DSL spec")
    a.add_argument("index_dir")
    a.add_argument("spec", help='JSON, e.g. \'{"l": {"terms": '
                                '{"field": "lang"}}}\'')
    a.add_argument("-q", "--query", default=None)

    w = sub.add_parser("warmup", help="prefetch exactly the pages a "
                                      "query will touch (warmupQuery)")
    w.add_argument("index_dir")
    w.add_argument("query")

    args = p.parse_args(argv)

    try:
        return _dispatch(args)
    except FileNotFoundError as e:
        # NOT KeyError: an internal KeyError is a bug whose traceback a
        # user needs, not a cryptic one-token {"error": "'hotcache'"}
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 2
    except Exception as e:  # QueryParseError etc. — friendly, no traceback
        if type(e).__name__ in ("QueryParseError", "ValueError"):
            print(json.dumps({"error": f"{type(e).__name__}: {e}"}),
                  file=sys.stderr)
            return 2
        raise


def _dispatch(args) -> int:
    if args.cmd == "build":
        _init_ray()
        from tantivy4java_ray.pipelines.build import build_index
        # local paths absolutize CLIENT-side: build tasks run on cluster
        # workers whose cwd differs from the submitting shell's (under
        # an attached cluster / ray job submit). URLs pass through.
        import os as _os

        from tantivy4java_ray import storage as _st
        paths = [p if _st.is_url(p) else _os.path.abspath(p)
                 for p in args.paths]
        index_dir = (args.index_dir if _st.is_url(args.index_dir)
                     else _os.path.abspath(args.index_dir))
        res = build_index(
            paths if len(paths) > 1 else paths[0],
            index_dir, text_fields=tuple(args.text_fields),
            num_shards=args.num_shards,
            target_docs_per_partition=args.target_docs,
            html_fallback=tuple(args.html_fallback)
            if args.html_fallback else None)
        print(json.dumps({"num_docs": res.num_docs,
                          "partitions": res.num_partitions,
                          "shards": res.num_shards,
                          "elapsed_s": round(res.elapsed_s, 2),
                          "docs_per_sec": round(res.docs_per_sec, 1)}))
    elif args.cmd == "bundle":
        from tantivy4java_ray.pipelines.bundle import bundle_index
        footer = bundle_index(args.index_dir, args.out,
                              include_txlog=args.include_txlog)
        print(json.dumps({"out": args.out,
                          "num_files": footer["num_files"],
                          "hotcached": len(footer["hotcache"])}))
    elif args.cmd == "search":
        from tantivy4java_ray.pipelines.search import IndexReader
        r = IndexReader(_maybe_split(args.index_dir))
        res = r.search(args.query, args.limit)
        rows = [{"rank": i, "doc_id": d, "score": round(s, 4)}
                for i, (s, d) in enumerate(res.hits)]
        if args.fields and rows:
            tbl = r.retrieve_docs([x["doc_id"] for x in rows],
                                  columns=args.fields)
            for i, row in enumerate(rows):
                for c in args.fields:
                    row[c] = tbl.column(c)[i].as_py()
        if args.snippet and rows:
            from tantivy4java_ray.functions.snippet import highlight_hits
            from tantivy4java_ray.query import parse_query
            q = parse_query(args.query, r.schema)
            snips = highlight_hits(r, q, [x["doc_id"] for x in rows],
                                   field=args.snippet,
                                   max_chars=args.snippet_chars)
            for row, sn in zip(rows, snips):
                row["snippet"] = sn
        print(json.dumps(rows, default=str))
    elif args.cmd == "merge":
        _init_ray()
        from tantivy4java_ray.pipelines.merge import merge_indexes
        res = merge_indexes([_maybe_split(p) for p in args.inputs],
                            args.out, skip_corrupt=args.skip_corrupt)
        print(json.dumps({"num_docs": res.num_docs,
                          "elapsed_s": round(res.elapsed_s, 2),
                          "skipped": [{"index_dir": s.index_dir,
                                       "reason": s.reason}
                                      for s in (res.skipped or [])]}))
    elif args.cmd == "validate":
        from tantivy4java_ray.pipelines.search import validate_index
        problems = validate_index(_maybe_split(args.index_dir))
        if args.deep:
            from tantivy4java_ray.pipelines.integrity import \
                verify_checksums
            # raw path: integrity detects .split bundles itself (their
            # sidecar sits NEXT to the single file)
            problems += verify_checksums(args.index_dir)
        print(json.dumps({"valid": not problems, "problems": problems}))
        return 1 if problems else 0
    elif args.cmd == "checksum":
        from tantivy4java_ray.pipelines.integrity import write_checksums
        side = write_checksums(args.index_dir)
        print(json.dumps({
            "files": len(side["files"]),
            "total_bytes": sum(f["size"] for f in side["files"].values())}))
    elif args.cmd == "info":
        from tantivy4java_ray.pipelines.search import (IndexReader,
                                                       read_index_metadata)
        meta = read_index_metadata(_maybe_split(args.index_dir))
        if args.sizes:
            meta["component_sizes"] = IndexReader(
                _maybe_split(args.index_dir)).per_field_component_sizes()
        print(json.dumps(meta, indent=2))
    elif args.cmd == "agg":
        from tantivy4java_ray.pipelines.search import IndexReader
        from tantivy4java_ray.query import parse_query
        r = IndexReader(_maybe_split(args.index_dir))
        q = parse_query(args.query, r.schema) if args.query else None
        print(json.dumps(r.aggregate(q, json.loads(args.spec)),
                         default=str))
    elif args.cmd == "warmup":
        from tantivy4java_ray.pipelines.search import IndexReader
        r = IndexReader(_maybe_split(args.index_dir))
        print(json.dumps(r.warmup(args.query)))
    return 0


def _maybe_split(path: str) -> str:
    """A ``.split`` bundle path opens through the bundle protocol."""
    if path.endswith(".split") and "://" not in path:
        from tantivy4java_ray.pipelines.bundle import split_url
        return split_url(path)
    return path


if __name__ == "__main__":
    sys.exit(main())
