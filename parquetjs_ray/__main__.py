"""CLI: encode / decode / verify / info / compact / vacuum.

The CLI owns its Ray session (guarded init — the library itself never
calls ray.init; see __ray_entry__ contract).

    python -m parquetjs_ray encode  IN_DIR OUT_DIR [--mode files] [--compression zstd]
    python -m parquetjs_ray decode  OUT_DIR DEST_PARQUET_DIR [--columns a,b]
    python -m parquetjs_ray verify  IN_DIR OUT_DIR          # vs the original
    python -m parquetjs_ray verify --artifact OUT_DIR        # vs stored fingerprints
    python -m parquetjs_ray info    OUT_DIR
    python -m parquetjs_ray compact OUT_DIR
    python -m parquetjs_ray vacuum  OUT_DIR   # GC crash/retry remnants
    python -m parquetjs_ray delete  OUT_DIR --where '[["event_id", ">=", 1000]]'
    python -m parquetjs_ray upsert  OUT_DIR NEW_ROWS.parquet [--key doc_id]
    python -m parquetjs_ray changes OUT_DIR V_FROM DEST_DIR [--v-to N]   # CDC feed
    python -m parquetjs_ray history OUT_DIR   # version log with cut-time totals
    python -m parquetjs_ray restore OUT_DIR VERSION   # undo to a snapshot
    python -m parquetjs_ray optimize OUT_DIR DEST --by ts          # sorted recluster
    python -m parquetjs_ray optimize OUT_DIR DEST --by ts,value    # Z-ORDER
    python -m parquetjs_ray stats OUT_DIR   # per-column codec/size metrics
    python -m parquetjs_ray check OUT_DIR --rules '{"id_nonneg": [["event_id", ">=", 0]]}'
    python -m parquetjs_ray shards DOCS_PARQUET OUT_DIR --capacity 4096   # corpus -> packed training shards
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="parquetjs_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("encode")
    pe.add_argument("input")
    pe.add_argument("out_dir")
    pe.add_argument("--mode", default="files", choices=["files", "grouped", "sharded"])
    pe.add_argument("--compression", default=None)
    pe.add_argument("--target-rows", type=int, default=16_384)
    pe.add_argument("--id-col", default="doc_id")
    pe.add_argument("--source-col", default="source")
    pe.add_argument("--row-fingerprint", action="store_true",
                    help="record per-unit row fingerprints for artifact self-verification")
    pe.add_argument("--bloom-cols", default=None, metavar="A,B",
                    help="columns to index with per-chunk Bloom filters (== predicate pruning)")
    pe.add_argument("--profile", default=None, choices=["fast", "balanced", "small"],
                    help="codec speed/size tradeoff (persisted in the plan artifact)")

    pd = sub.add_parser("decode")
    pd.add_argument("out_dir")
    pd.add_argument("dest")
    pd.add_argument("--columns", default=None)
    pd.add_argument("--version", type=int, default=None,
                    help="time travel: read the artifact as of this snapshot version")

    pdel = sub.add_parser("delete")
    pdel.add_argument("out_dir")
    pdel.add_argument("--where", required=True,
                      help='JSON conjunction, e.g. \'[["event_id", ">=", 1000]]\'')

    pup = sub.add_parser("upsert")
    pup.add_argument("out_dir")
    pup.add_argument("data", help="parquet file/dir of rows to merge by key")
    pup.add_argument("--key", default="doc_id")

    po = sub.add_parser("optimize")
    po.add_argument("out_dir")
    po.add_argument("dest")
    po.add_argument("--by", required=True, metavar="A[,B...]",
                    help="cluster column(s): one column = sorted recluster, several = Z-ORDER")
    po.add_argument("--id-col", default="doc_id")
    po.add_argument("--target-rows", type=int, default=16_384)

    ps = sub.add_parser("stats")
    ps.add_argument("out_dir")

    pk = sub.add_parser("check")
    pk.add_argument("out_dir")
    pk.add_argument("--rules", required=True,
                    help='JSON rules, e.g. \'{"id_nonneg": [["event_id", ">=", 0]]}\'')

    ph = sub.add_parser("history")
    ph.add_argument("out_dir")

    pr = sub.add_parser("restore")
    pr.add_argument("out_dir")
    pr.add_argument("version", type=int)

    pch = sub.add_parser("changes")
    pch.add_argument("out_dir")
    pch.add_argument("v_from", type=int)
    pch.add_argument("dest", help="parquet dir for the change feed")
    pch.add_argument("--v-to", type=int, default=None)

    pv = sub.add_parser("verify")
    pv.add_argument("input", nargs="?")
    pv.add_argument("out_dir", nargs="?")
    pv.add_argument("--artifact", default=None, metavar="OUT_DIR",
                    help="verify against fingerprints stored in the artifact (no original scan)")

    pi = sub.add_parser("info")
    pi.add_argument("out_dir")

    pc = sub.add_parser("compact")
    pc.add_argument("out_dir")

    pvac = sub.add_parser("vacuum")
    pvac.add_argument("out_dir")

    psh = sub.add_parser("shards", help="corpus -> packed training shards")
    psh.add_argument("input", help="parquet file/dir with (doc_id, text, source)")
    psh.add_argument("out_dir")
    psh.add_argument("--capacity", type=int, default=4096, help="tokens per window")
    psh.add_argument("--vocab-size", type=int, default=65_536)
    psh.add_argument("--text-col", default="text")
    psh.add_argument("--compression", default=None)
    psh.add_argument("--target-rows", type=int, default=16_384)

    args = p.parse_args(argv)
    ray = _ray()
    try:
        from .pipelines.encode import compact_dataset, dataset_info, decode_dataset, encode_dataset
        from .pipelines.verify import verify_roundtrip

        if args.cmd == "encode":
            report = encode_dataset(
                args.input,
                args.out_dir,
                mode=args.mode,
                compression=args.compression,
                target_rows_per_partition=args.target_rows,
                id_col=args.id_col,
                source_col=args.source_col or None,
                row_fingerprint=args.row_fingerprint,
                bloom_columns=args.bloom_cols.split(",") if args.bloom_cols else None,
                profile=args.profile,
            )
            print(json.dumps(report))
        elif args.cmd == "decode":
            cols = args.columns.split(",") if args.columns else None
            decode_dataset(args.out_dir, columns=cols, version=args.version).write_parquet(args.dest)
            print(json.dumps({"dest": args.dest}))
        elif args.cmd == "delete":
            from .pipelines.encode import delete_rows

            clauses = [tuple(c) for c in json.loads(args.where)]
            print(json.dumps(delete_rows(args.out_dir, clauses)))
        elif args.cmd == "upsert":
            import ray.data as rd

            from .pipelines.encode import upsert_rows

            print(json.dumps(upsert_rows(args.out_dir, rd.read_parquet(args.data), key=args.key)))
        elif args.cmd == "optimize":
            from .pipelines.encode import recluster_dataset, zorder_dataset

            cols = args.by.split(",")
            if len(cols) == 1:
                rep = recluster_dataset(
                    args.out_dir, args.dest, by=cols[0], id_col=args.id_col,
                    target_rows_per_partition=args.target_rows,
                )
            else:
                rep = zorder_dataset(
                    args.out_dir, args.dest, by=cols, id_col=args.id_col,
                    target_rows_per_partition=args.target_rows,
                )
            print(json.dumps(rep))
        elif args.cmd == "stats":
            from .pipelines.encode import column_stats

            print(json.dumps(column_stats(args.out_dir)))
        elif args.cmd == "check":
            from .pipelines.encode import validate_artifact

            rules = {k: [tuple(c) for c in v] for k, v in json.loads(args.rules).items()}
            rep = validate_artifact(args.out_dir, rules)
            print(json.dumps(rep))
            return 0 if rep["ok"] else 2
        elif args.cmd == "history":
            from .pipelines.encode import table_history

            print(json.dumps(table_history(args.out_dir)))
        elif args.cmd == "restore":
            from .pipelines.encode import restore_version

            print(json.dumps(restore_version(args.out_dir, args.version)))
        elif args.cmd == "changes":
            from .pipelines.changes import table_changes

            feed = table_changes(args.out_dir, args.v_from, args.v_to)
            feed.write_parquet(args.dest)
            print(json.dumps({"dest": args.dest}))
        elif args.cmd == "verify":
            if args.artifact:
                from .pipelines.verify import verify_artifact

                v = verify_artifact(args.artifact)
            else:
                import ray.data as rd

                if not (args.input and args.out_dir):
                    print("verify needs IN_DIR OUT_DIR, or --artifact OUT_DIR", file=sys.stderr)
                    return 2
                v = verify_roundtrip(rd.read_parquet(args.input), decode_dataset(args.out_dir))
            print(json.dumps(v))
            return 0 if v["equal"] else 2
        elif args.cmd == "info":
            info = dataset_info(args.out_dir)
            info["schema"] = str(info["schema"]) if info["schema"] is not None else None
            print(json.dumps(info))
        elif args.cmd == "compact":
            print(json.dumps(compact_dataset(args.out_dir)))
        elif args.cmd == "vacuum":
            from .pipelines.encode import vacuum

            print(json.dumps(vacuum(args.out_dir)))
        elif args.cmd == "shards":
            import pyarrow as pa
            import ray.data as rd

            from .functions.packing import materialize_windows
            from .functions.tokenize import tokenize
            from .pipelines.encode import encode_stream
            from .stages.stats import build_plan_from_dataset

            docs = rd.read_parquet(args.input)
            win = materialize_windows(
                tokenize(docs, column=args.text_col, top_k=args.vocab_size),
                capacity=args.capacity,
            )

            def add_shard_id(b: "pa.Table") -> "pa.Table":
                sid = [
                    f"{s}/{w}"
                    for s, w in zip(b["source"].to_pylist(), b["window_id"].to_pylist())
                ]
                return b.append_column("shard_id", pa.array(sid, pa.string()))

            shards = win.map_batches(add_shard_id, batch_format="pyarrow")
            plan = build_plan_from_dataset(shards, fsst_columns=("shard_id",))
            report = encode_stream(
                shards, args.out_dir, plan=plan, id_col="shard_id",
                compression=args.compression,
                target_rows_per_partition=args.target_rows,
            )
            print(json.dumps(report))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
