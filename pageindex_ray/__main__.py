"""Job entry points, runnable standalone or via ``ray job submit``:

    python -m pageindex_ray build  --input <transcripts.parquet|dir> --index <dir>
    python -m pageindex_ray search --index <dir> --query "text" [-k 10] [--conv]
    python -m pageindex_ray bench-queries --index <dir> --queries <parquet>

Reference analogue: run_pageindex.py (/root/reference/run_pageindex.py:6-46).
Owns the Ray session (guarded init — the driver/test harness inits Ray
itself and never goes through this module).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pageindex_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) the inverted index")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--partitions", type=int, default=32)
    b.add_argument("--k1", type=float, default=1.5)
    b.add_argument("--b", type=float, default=0.75)
    b.add_argument("--block-size", type=int, default=128)
    b.add_argument("--salt-factor", type=int, default=8)
    b.add_argument(
        "--reduce",
        choices=["auto", "direct", "sort_groupby"],
        default="auto",
        help="reduce transport: auto (size-based, default), direct hash reduce, or Ray sort shuffle",
    )
    b.add_argument(
        "--doc-base", type=int, default=0,
        help="global doc_id of this input's first turn (wave builds; see merge)",
    )
    b.add_argument(
        "--tokenizer", default="alnum-lower-v1",
        help="registered tokenizer spec name (pageindex_ray.tokenizer registry)",
    )

    mg = sub.add_parser("merge", help="merge committed wave indexes into one index")
    mg.add_argument("--waves", nargs="+", required=True, help="wave index dirs (any order)")
    mg.add_argument("--out", required=True)

    apd = sub.add_parser(
        "append", help="build a new conv-ordered wave and merge it onto an existing index"
    )
    apd.add_argument("--index", required=True, help="existing committed index dir")
    apd.add_argument("--input", required=True, help="new transcripts parquet/dir")
    apd.add_argument("--out", required=True, help="merged output index dir")

    info = sub.add_parser("info", help="inspect a committed index (meta + lineage totals)")
    info.add_argument("--index", required=True)

    s = sub.add_parser("search", help="BM25 top-k against a built index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--conv", action="store_true", help="conversation granularity")
    s.add_argument(
        "--segment", type=int, default=0, metavar="SPAN",
        help="segment granularity with the given turn span (e.g. 4)",
    )
    s.add_argument(
        "--tree", default="", metavar="SPANS",
        help="multi-level tree rollup: comma-separated nested spans, each "
        "strictly dividing its parent (e.g. 16,4 = top-k convs with best "
        "16-turn segment, best nested 4-turn segment, best turn)",
    )
    s.add_argument("--wand", action="store_true", help="use block-max WAND")
    s.add_argument("--shards", type=int, default=8)
    s.add_argument(
        "--scorers", default="auto",
        help="doc-range scorer pool size (int) or 'auto' (engages at >=1M docs)",
    )
    s.add_argument(
        "--where", nargs="+", metavar="COL=VALUE", default=None,
        help="attribute filter clauses (needs the attrs sidecar; AND across clauses)",
    )
    s.add_argument(
        "--similarity", choices=["bm25", "lm", "rrf"], default="bm25",
        help="ranker: bm25 (default), lm (Dirichlet, mu=2000), rrf (fuse both)",
    )
    s.add_argument(
        "--boost", nargs="+", metavar="COL=VALUE:W", default=None,
        help="attribute score boosts, e.g. role=assistant:2.0 (needs attrs sidecar)",
    )
    s.add_argument(
        "--after", default=None, metavar="SCORE,DOC_ID",
        help="keyset-pagination cursor: the previous page's last (score, doc_id)",
    )

    s.add_argument(
        "--sort-by", default=None, metavar="COL",
        help="order matches by this docvalues column instead of relevance",
    )
    s.add_argument("--asc", action="store_true", help="ascending field sort (with --sort-by)")

    dv = sub.add_parser(
        "docvalues", help="build the numeric doc-values sidecar (sort-by-field)"
    )
    dv.add_argument("--index", required=True, help="committed index dir")
    dv.add_argument("--input", required=True, help="the transcripts the index was built from")
    dv.add_argument("--columns", nargs="+", default=["ts"], help="numeric columns to store")

    ex = sub.add_parser(
        "export", help="stream the FULL match set to partitioned parquet"
    )
    ex.add_argument("--index", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument(
        "--min-match", type=int, default=1,
        help="keep docs matching at least this many distinct query terms",
    )

    sp = sub.add_parser(
        "span", help="ordered span-near search from the positional sidecar"
    )
    sp.add_argument("--index", required=True)
    sp.add_argument("--query", required=True, help="the token sequence (order matters)")
    sp.add_argument("--slop", type=int, default=3, help="max extra tokens interleaved")

    at = sub.add_parser(
        "attrs", help="build the attribute sidecar (filtered retrieval / facets)"
    )
    at.add_argument("--index", required=True, help="committed index dir")
    at.add_argument("--input", required=True, help="the transcripts the index was built from")
    at.add_argument(
        "--columns", nargs="+", default=["role"], help="attribute columns to index"
    )

    ps = sub.add_parser(
        "positions", help="build the positional sidecar (index-only phrase search)"
    )
    ps.add_argument("--index", required=True, help="committed index dir")
    ps.add_argument("--input", required=True, help="the transcripts the index was built from")

    ph = sub.add_parser(
        "phrase", help="exact-phrase search answered from the positional sidecar"
    )
    ph.add_argument("--index", required=True)
    ph.add_argument("--query", required=True, help="the phrase text")

    qy = sub.add_parser(
        "query",
        help='query-string search: +must -not "phrase" pre* fuzzy~ should',
    )
    qy.add_argument("--index", required=True)
    qy.add_argument("--query", required=True)
    qy.add_argument("-k", type=int, default=10)

    st = sub.add_parser(
        "stored", help="build the stored-fields store (snippets / doc hydration)"
    )
    st.add_argument("--index", required=True, help="committed index dir")
    st.add_argument("--input", required=True, help="the transcripts the index was built from")
    st.add_argument(
        "--columns", nargs="+", default=["text"], help="field columns to store"
    )

    dl = sub.add_parser(
        "delete", help="tombstone doc ids (masked at query time; stats unchanged)"
    )
    dl.add_argument("--index", required=True)
    dl.add_argument("--ids", nargs="+", type=int, required=True, help="doc ids to delete")

    cp = sub.add_parser(
        "compact", help="expunge tombstoned docs into a new index (stats recomputed)"
    )
    cp.add_argument("--index", required=True)
    cp.add_argument("--out", required=True)

    rf = sub.add_parser(
        "refresh",
        help="continuous-ingest loop: init / append micro-waves / delete / "
        "compact under an atomic current-generation pointer (pipelines/refresh.py)",
    )
    rf.add_argument("--root", required=True, help="refresh root (holds gen-* + current.json)")
    rf.add_argument("--init", metavar="PARQUET", help="seed corpus: build generation 0")
    rf.add_argument(
        "--append", nargs="+", default=[], metavar="PARQUET",
        help="micro-wave(s) to append, in order",
    )
    rf.add_argument("--delete", nargs="+", type=int, default=[], metavar="DOC_ID",
                    help="tombstone doc ids on the live generation")
    rf.add_argument("--compact", action="store_true", help="compact the live generation")
    rf.add_argument("--status", action="store_true", help="print the live status")
    rf.add_argument(
        "--auto-compact-every", type=int, default=0, metavar="N",
        help="compact after every N appends (0 = only on --compact / deleted-fraction)",
    )

    q = sub.add_parser("bench-queries", help="p50 latency over a query parquet")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True)
    q.add_argument("-k", type=int, default=10)

    args = ap.parse_args(argv)

    import ray

    # only tear down a Ray session this entry point itself started — a
    # library caller invoking main() inside an existing session must get
    # their cluster back intact
    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        if args.cmd == "build":
            from .config import BuildConfig
            from .pipelines.build import build_index

            cfg = BuildConfig(
                num_partitions=args.partitions,
                k1=args.k1,
                b=args.b,
                block_size=args.block_size,
                salt_factor=args.salt_factor,
                reduce_strategy=args.reduce,
                tokenizer=args.tokenizer,
            )
            report = build_index(args.input, args.index, cfg, doc_base=args.doc_base)
            print(json.dumps(report))
        elif args.cmd == "merge":
            from .pipelines.merge import merge_indexes

            print(json.dumps(merge_indexes(args.waves, args.out)))
        elif args.cmd == "append":
            from .pipelines.merge import append_wave

            print(json.dumps(append_wave(args.index, args.input, args.out)))
        elif args.cmd == "info":
            import os

            from .pipelines.build import load_meta

            meta = load_meta(args.index)
            lineage = {"n_terms": 0, "n_postings": 0, "parts": 0}
            meta_dir = os.path.join(args.index, "_meta")
            if os.path.isdir(meta_dir):
                for fn in sorted(os.listdir(meta_dir)):
                    if fn.startswith("part-") and fn.endswith(".json"):
                        with open(os.path.join(meta_dir, fn)) as f:
                            rec = json.load(f)
                        lineage["n_terms"] += int(rec.get("n_terms", 0))
                        lineage["n_postings"] += int(rec.get("n_postings", 0))
                        lineage["parts"] += 1
            print(
                json.dumps(
                    {
                        "n_docs": meta["n_docs"],
                        "doc_base": meta.get("doc_base", 0),
                        "avgdl": meta["avgdl"],
                        "total_tokens": meta["total_tokens"],
                        "num_partitions": meta["config"]["num_partitions"],
                        "parts_present": len(meta.get("parts_present", [])),
                        "hot_terms": len(meta.get("hot_terms", [])),
                        "committed": os.path.exists(os.path.join(args.index, "_SUCCESS")),
                        "merged_from": len(meta.get("merged_from", [])) or None,
                        "lineage": lineage,
                    }
                )
            )
        elif args.cmd == "attrs":
            from .pipelines.attrs import build_attrs

            print(json.dumps(build_attrs(args.index, args.input, tuple(args.columns))))
        elif args.cmd == "delete":
            from .pipelines.tombstones import add_tombstones

            print(json.dumps(add_tombstones(args.index, args.ids)))
        elif args.cmd == "compact":
            from .pipelines.compact import compact_index

            print(json.dumps(compact_index(args.index, args.out)))
        elif args.cmd == "refresh":
            from .pipelines.refresh import RefreshRunner

            r = RefreshRunner(args.root, auto_compact_every=args.auto_compact_every)
            out = []
            if args.init:
                out.append({"init": r.init(args.init)["pointer"]})
            for w in args.append:
                step = r.append(w)
                out.append({"append": step["pointer"], "pruned": step["pruned"],
                            **({"compaction": step["compaction"]["pointer"]}
                               if "compaction" in step else {})})
            if args.delete:
                res = r.delete(args.delete)
                entry = {"delete": len(args.delete)}
                if isinstance(res, dict) and "compaction" in res:
                    # a deleted-fraction-triggered compaction flipped the
                    # pointer — operators scripting against this JSON must
                    # see the new live generation
                    entry["compaction"] = res["compaction"]["pointer"]
                out.append(entry)
            if args.compact:
                out.append({"compact": r.compact()["pointer"]})
            if args.status or not out:
                out.append({"status": r.status()})
            print(json.dumps(out))
        elif args.cmd == "positions":
            from .pipelines.positions import build_positions

            print(json.dumps(build_positions(args.index, args.input)))
        elif args.cmd == "phrase":
            from .pipelines.positions import phrase_search_positional

            t = phrase_search_positional(args.index, [(0, args.query)])
            print(json.dumps(t.drop_columns(["query_id"]).to_pylist()))
        elif args.cmd == "query":
            from .pipelines.search import SearchEngine

            eng = SearchEngine(args.index)
            print(json.dumps(eng.query_string(args.query, k=args.k)))
            eng.shutdown()
        elif args.cmd == "stored":
            from .pipelines.stored import build_stored_fields

            print(json.dumps(build_stored_fields(args.index, args.input, tuple(args.columns))))
        elif args.cmd == "search":
            from .pipelines.search import SearchEngine

            scorers = args.scorers if args.scorers == "auto" else int(args.scorers)
            eng = SearchEngine(args.index, num_shards=args.shards, num_scorers=scorers)
            gran = "conv" if args.conv else ("segment" if args.segment else "turn")
            boost = None
            if args.boost:
                boost = {}
                for clause in args.boost:
                    col, vw = clause.split("=", 1)
                    value, w = vw.rsplit(":", 1)
                    boost.setdefault(col, {})[value] = float(w)
            after = None
            if args.after:
                cs, cd = args.after.split(",", 1)
                after = (float(cs), int(cd))
            # fail fast on flag combinations a path would silently ignore —
            # the library raises on every unsupported combination and the
            # CLI must not be the door that quietly drops a filter
            if args.sort_by and args.similarity != "bm25":
                raise SystemExit("--sort-by orders by field; --similarity does not apply")
            if args.similarity in ("lm", "rrf"):
                unsupported = [
                    name
                    for name, v in [
                        ("--where", args.where), ("--boost", args.boost),
                        ("--after", args.after), ("--conv", args.conv),
                        ("--segment", args.segment), ("--wand", args.wand),
                    ]
                    if v
                ]
                if unsupported:
                    raise SystemExit(
                        f"--similarity {args.similarity} does not support "
                        + " ".join(unsupported)
                    )
            if args.sort_by and (args.boost or args.after or args.conv or args.segment
                                 or args.wand):
                raise SystemExit(
                    "--sort-by supports --where only (no boost/after/granularity/wand)"
                )
            if args.tree and (args.conv or args.segment or args.wand or args.after
                              or args.boost or args.sort_by
                              or args.similarity != "bm25"):
                raise SystemExit("--tree supports --where only")
            if args.tree:
                hits = eng.search_tree(
                    args.query,
                    k=args.k,
                    spans=tuple(int(x) for x in args.tree.split(",")),
                    where=dict(w.split("=", 1) for w in args.where) if args.where else None,
                )
            elif args.sort_by:
                hits = eng.sorted_search(
                    args.query, by=args.sort_by, k=args.k, descending=not args.asc,
                    where=dict(w.split("=", 1) for w in args.where) if args.where else None,
                )
            elif args.similarity == "lm":
                hits = eng.lm_search(args.query, k=args.k)
            elif args.similarity == "rrf":
                t = eng.rrf_search_batch([(0, args.query)], k=args.k)
                # same single-query hit shape as the other rankers
                docs = t.column("doc_id").to_numpy()
                convs, turns = eng.doc_location(docs)
                hits = [
                    {
                        "rank": int(r["rank"]),
                        "doc_id": int(r["doc_id"]),
                        "score": float(r["rrf_score"]),
                        "conv_id": str(convs[i]),
                        "turn_idx": int(turns[i]),
                    }
                    for i, r in enumerate(t.to_pylist())
                ]
            else:
                hits = eng.search(
                    args.query,
                    k=args.k,
                    granularity=gran,
                    use_wand=args.wand,
                    segment_span=args.segment or 4,
                    where=dict(w.split("=", 1) for w in args.where) if args.where else None,
                    search_after=after,
                    boost=boost,
                )
            print(json.dumps(hits))
            eng.shutdown()
        elif args.cmd == "docvalues":
            from .pipelines.docvalues import build_docvalues

            print(json.dumps(build_docvalues(args.index, args.input, tuple(args.columns))))
        elif args.cmd == "export":
            from .pipelines.export import export_search

            print(json.dumps(export_search(args.index, args.query, args.out, args.min_match)))
        elif args.cmd == "span":
            from .pipelines.positions import span_near_search

            t = span_near_search(args.index, [(0, args.query)], slop=args.slop)
            print(json.dumps(t.to_pylist()))
        elif args.cmd == "bench-queries":
            import statistics
            import time

            import pyarrow.parquet as pq

            from .pipelines.search import SearchEngine

            eng = SearchEngine(args.index)
            t = pq.read_table(args.queries)
            texts = t.column("text").to_pylist()
            lat = []
            for qt in texts:
                t0 = time.perf_counter()
                eng.search(qt, k=args.k)
                lat.append(time.perf_counter() - t0)
            print(
                json.dumps(
                    {
                        "n_queries": len(texts),
                        "p50_ms": round(statistics.median(lat) * 1000, 3),
                        "p95_ms": round(sorted(lat)[int(0.95 * len(lat))] * 1000, 3),
                    }
                )
            )
            eng.shutdown()
    except ValueError as e:
        # user-input errors (bad scale dir, uninitialized/already-initialized
        # refresh root, contract violations) get a clean one-line message
        # instead of a traceback. json.JSONDecodeError IS a ValueError but
        # signals corrupted index state, not bad input — propagate it raw so
        # the operator gets the filename and stack
        if isinstance(e, json.JSONDecodeError):
            raise
        print(f"error: {e}", file=sys.stderr)
        return 2
    finally:
        if owns_ray:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
