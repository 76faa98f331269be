"""CLI with the reference's verb surface (cmd/icegopher/main.go:34-64):

    python -m icegopher_spark.iceberg.cli [--catalog URI] VERB ...

Verbs: list, describe, schema, spec, location, uuid, files [--history],
snapshots, refs, properties get/set/remove, rename, drop. Text output
mirrors output.go:35-216; --json emits machine-readable JSON (declared
but unimplemented in the reference, main.go:113-118).
"""

from __future__ import annotations

import argparse
import json
import sys

from .catalog import CatalogError, load_catalog, to_identifier


def _print_table(headers: list[str], rows: list[tuple]) -> None:
    widths = [len(h) for h in headers]
    srows = [[str(c) for c in r] for r in rows]
    for r in srows:
        for i, c in enumerate(r):
            widths[i] = max(widths[i], len(c))
    line = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    print(line)
    print("|" + "|".join(f" {h:<{w}} " for h, w in zip(headers, widths)) + "|")
    print(line)
    for r in srows:
        print("|" + "|".join(f" {c:<{w}} " for c, w in zip(r, widths)) + "|")
    print(line)


def _files_tree(table, history: bool) -> None:
    """Snapshot → manifest → datafile tree (reference output.go:108-158)."""
    from .manifests import fetch_entries, read_manifest_list

    md = table.metadata
    snapshots = md.snapshots if history else ([md.current_snapshot] if md.current_snapshot else [])
    print(f"{'.'.join(table.identifier)}: files")
    for snap in snapshots:
        if snap is None:
            continue
        print(f"└─ Snapshot {snap.snapshot_id}, schema {snap.schema_id}: {snap.manifest_list}")
        for m in read_manifest_list(table.io.read(snap.manifest_list)):
            print(f"   └─ Manifest: {m.manifest_path}")
            for e in fetch_entries(m, table.io.read(m.manifest_path), True):
                print(f"      └─ Datafile: {e.data_file.file_path}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="icegopher")
    p.add_argument(
        "--catalog",
        default="",
        help="catalog URI (http(s):// REST, thrift:// Hive, sqlite: SQL,"
        " path → static)",
    )
    p.add_argument("--warehouse", default="", help="warehouse path/name")
    p.add_argument(
        "--property",
        action="append",
        default=[],
        metavar="K=V",
        help="catalog property (repeatable), e.g. --property type=glue"
        " --property glue.endpoint=http://…",
    )
    p.add_argument("--json", action="store_true", dest="as_json")
    sub = p.add_subparsers(dest="verb", required=True)

    sp = sub.add_parser("list")
    sp.add_argument("parent", nargs="?", default="")
    for verb in ("describe", "schema", "spec", "location", "uuid", "snapshots", "refs"):
        sp = sub.add_parser(verb)
        sp.add_argument("identifier")
    sp = sub.add_parser("files")
    sp.add_argument("identifier")
    sp.add_argument("--history", action="store_true")
    sp = sub.add_parser("properties")
    sp.add_argument("action", choices=["get", "set", "remove"])
    sp.add_argument("entity", choices=["table", "namespace"])
    sp.add_argument("identifier")
    sp.add_argument("key", nargs="?")
    sp.add_argument("value", nargs="?")
    sp = sub.add_parser("rename")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp = sub.add_parser("drop")
    sp.add_argument("entity", choices=["table", "namespace"])
    sp.add_argument("identifier")
    for verb in ("tag", "branch"):
        sp = sub.add_parser(verb)
        sp.add_argument("identifier")
        sp.add_argument("name")
        sp.add_argument("--snapshot", type=int, default=None)
    sp = sub.add_parser("drop-ref")
    sp.add_argument("identifier")
    sp.add_argument("name")
    sp = sub.add_parser("rollback")
    sp.add_argument("identifier")
    sp.add_argument("snapshot", type=int)
    sp = sub.add_parser("expire")
    sp.add_argument("identifier")
    sp.add_argument("--retain-last", type=int, default=1)
    sp.add_argument("--older-than-ms", type=int, default=None)
    sp = sub.add_parser("rewrite-manifests")
    sp.add_argument("identifier")
    sp = sub.add_parser("orphans")
    sp.add_argument("identifier")
    sp.add_argument("--remove", action="store_true")
    sp = sub.add_parser("add-files")
    sp.add_argument("identifier")
    sp.add_argument("paths", nargs="+", help="existing parquet/ORC files to adopt in place")
    sp = sub.add_parser("register")
    sp.add_argument("identifier")
    sp.add_argument("metadata_location", help="existing table metadata JSON to adopt")
    sp = sub.add_parser("compact")
    sp.add_argument("identifier")
    sp = sub.add_parser("zorder")
    sp.add_argument("identifier")
    sp.add_argument("cols", nargs="+", help="2-6 cluster columns")
    sp.add_argument("--n-files", type=int, default=8)
    sp = sub.add_parser("analyze")
    sp.add_argument("identifier")
    sp.add_argument("--columns", help="comma-separated column subset")
    sp.add_argument(
        "--approx",
        action="store_true",
        help="HLL++ NDV (one map-side pass; the 100 TB posture) "
        "instead of exact COUNT(DISTINCT)",
    )
    sp.add_argument("--rsd", type=float, default=0.05)
    sp = sub.add_parser("partition-stats")
    sp.add_argument("identifier")
    sp = sub.add_parser("rewrite-deletes")
    sp.add_argument("identifier")
    sp.add_argument(
        "--equality",
        action="store_true",
        help="also materialize equality deletes into deletion vectors",
    )
    sp = sub.add_parser("delta-import")
    sp.add_argument("identifier", help="target Iceberg table")
    sp.add_argument("delta_path", help="source Delta table directory")
    sp.add_argument("--version", type=int, default=None, help="Delta version to import")
    sp = sub.add_parser("delta-export")
    sp.add_argument("identifier", help="source Iceberg table")
    sp.add_argument("delta_path", help="target Delta table directory (created)")
    sp.add_argument("--partition-by", help="comma-separated partition columns")
    sp = sub.add_parser("delta-history")
    sp.add_argument("delta_path", help="Delta table directory")
    sp = sub.add_parser("delta-delete")
    sp.add_argument("delta_path", help="Delta table directory")
    sp.add_argument(
        "where", help="SQL predicate over the table's columns (e.g. \"k % 9 = 0\")"
    )
    sp = sub.add_parser("delta-optimize")
    sp.add_argument("delta_path", help="Delta table directory")
    sp.add_argument("--target-mb", type=int, default=128, help="target file size")
    sp = sub.add_parser("delta-zorder")
    sp.add_argument("delta_path", help="Delta table directory")
    sp.add_argument("columns", nargs="+", help="cluster columns (2-6)")
    sp.add_argument("--n-files", type=int, default=8, help="output file count")
    sp = sub.add_parser("delta-restore")
    sp.add_argument("delta_path", help="Delta table directory")
    sp.add_argument("version", type=int, help="version to restore to")
    sp = sub.add_parser("delta-vacuum")
    sp.add_argument("delta_path", help="Delta table directory")
    sp.add_argument(
        "--retention-hours", type=float, default=168.0, help="retention window"
    )
    sp.add_argument(
        "--apply",
        action="store_true",
        help="actually delete the candidates (default: dry run)",
    )
    sp.add_argument(
        "--force",
        action="store_true",
        help="allow retention under 7 days (concurrent readers of "
        "recent versions may lose files — delta-spark's "
        "retentionDurationCheck override)",
    )
    sp = sub.add_parser("delta-checkpoint")
    sp.add_argument("delta_path", help="Delta table directory")
    sp.add_argument(
        "--style",
        choices=["auto", "classic", "v2"],
        default="auto",
        help="auto = v2 when delta.checkpointPolicy=v2, else classic",
    )

    args = p.parse_args(argv)
    if args.verb == "delta-history":
        # pure-path verb: no catalog involved
        from ..delta import delta_history

        for row in delta_history(args.delta_path):
            print(json.dumps(row))
        return 0
    if args.verb == "delta-delete":
        # pure-path verb: deletion-vector merge-on-read DELETE
        from pyspark.sql import functions as F

        from ..delta_write import delete_where_delta
        from ..session import get_spark

        spark = get_spark("icegopher-cli")
        v = delete_where_delta(spark, args.delta_path, F.expr(args.where))
        print(f"deleted rows matching {args.where!r} -> version {v}")
        return 0
    if args.verb == "delta-optimize":
        from ..delta_write import optimize_delta
        from ..session import get_spark

        spark = get_spark("icegopher-cli")
        v = optimize_delta(
            spark, args.delta_path, target_file_bytes=args.target_mb * 1024 * 1024
        )
        print(
            f"optimized -> version {v}" if v is not None
            else "nothing to compact (no group of small files)"
        )
        return 0
    if args.verb == "delta-zorder":
        from ..delta_write import zorder_delta
        from ..session import get_spark

        spark = get_spark("icegopher-cli")
        v = zorder_delta(spark, args.delta_path, *args.columns, n_files=args.n_files)
        print(f"zordered on ({', '.join(args.columns)}) -> version {v}")
        return 0
    if args.verb == "delta-restore":
        from ..delta_write import restore_delta

        v = restore_delta(args.delta_path, args.version)
        print(f"restored to version {args.version} -> version {v}")
        return 0
    if args.verb == "delta-checkpoint":
        from ..delta_write import write_checkpoint

        v = write_checkpoint(args.delta_path, style=args.style)
        print(f"checkpoint written at version {v} (style={args.style})")
        return 0
    if args.verb == "delta-vacuum":
        retention_ms = int(args.retention_hours * 3600 * 1000)
        if args.apply:
            from ..delta import vacuum_delta

            try:
                deleted = vacuum_delta(
                    args.delta_path,
                    retention_ms=retention_ms,
                    enforce_retention_check=not args.force,
                )
            except ValueError as e:
                print(f"error: {e}", file=sys.stderr)
                return 1
            for p in deleted:
                print(p)
            print(f"# {len(deleted)} file(s) deleted")
        else:
            from ..delta import vacuum_candidates

            cands = vacuum_candidates(args.delta_path, retention_ms=retention_ms)
            for p in cands:
                print(p)
            print(f"# {len(cands)} vacuumable file(s) — dry run, nothing deleted")
        return 0
    props = {}
    if args.warehouse:
        props["warehouse"] = args.warehouse
    for kv in args.property:
        if "=" not in kv:
            print(f"error: --property needs K=V, got {kv!r}", file=sys.stderr)
            return 1
        k, v = kv.split("=", 1)
        props[k] = v
    try:
        cat = load_catalog("cli", args.catalog or args.warehouse, props)
    except CatalogError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    try:
        return _dispatch(args, cat)
    except (CatalogError, ValueError) as e:
        # ref/maintenance verbs raise ValueError for user mistakes
        # (duplicate tag, unknown snapshot) — a traceback is not an
        # error message (r6)
        print(f"error: {e}", file=sys.stderr)
        return 1


def _dispatch(args, cat) -> int:
    if args.verb == "list":
        if args.parent:
            items = cat.list_tables(args.parent)
        else:
            items = cat.list_namespaces()
            if not items:
                items = []
        if args.as_json:
            print(json.dumps([".".join(i) for i in items]))
        else:
            _print_table(["IDs"], [(".".join(i),) for i in items])
        return 0

    if args.verb in ("describe", "schema", "spec", "location", "uuid", "files", "snapshots", "refs"):
        t = cat.load_table(to_identifier(args.identifier))
        md = t.metadata
        if args.verb == "describe":
            rows = [
                ("format-version", md.format_version),
                ("table-uuid", md.table_uuid),
                ("location", md.location),
                ("current-snapshot-id", md.current_snapshot_id),
                ("current-schema-id", md.current_schema_id),
                ("default-spec-id", md.default_spec_id),
            ]
            if args.as_json:
                print(json.dumps(dict(rows)))
            else:
                _print_table(["key", "value"], rows)
        elif args.verb == "schema":
            if args.as_json:
                print(json.dumps(md.current_schema.to_json_dict()))
            else:
                print(md.current_schema)
                times = [
                    f.name for f in md.current_schema.fields if getattr(f.field_type, "name", "") == "time"
                ]
                if times:
                    print(
                        f"-- note: time column(s) {', '.join(times)} surface in "
                        "Spark as bigint microseconds-since-midnight "
                        "(Spark has no TIME type)"
                    )
        elif args.verb == "spec":
            if args.as_json:
                print(json.dumps(md.default_spec.to_json_dict()))
            else:
                print(md.default_spec)
        elif args.verb == "location":
            print(md.location)
        elif args.verb == "uuid":
            print(md.table_uuid)
        elif args.verb == "files":
            _files_tree(t, args.history)
        elif args.verb == "snapshots":
            rows = [
                (s.snapshot_id, s.sequence_number, s.timestamp_ms, s.operation or "")
                for s in md.snapshots
            ]
            if args.as_json:
                print(json.dumps([s.to_json_dict() for s in md.snapshots]))
            else:
                _print_table(["snapshot-id", "seq", "timestamp-ms", "operation"], rows)
        elif args.verb == "refs":
            rows = [(n, r.snapshot_ref_type, r.snapshot_id) for n, r in md.refs.items()]
            if args.as_json:
                print(json.dumps({n: r.to_json_dict() for n, r in md.refs.items()}))
            else:
                _print_table(["name", "type", "snapshot-id"], rows)
        return 0

    if args.verb == "properties":
        ident = to_identifier(args.identifier)
        if args.entity == "namespace":
            if args.action == "get":
                props = cat.load_namespace_properties(ident)
                if args.key:
                    print(props.get(args.key, ""))
                else:
                    _print_table(["key", "value"], sorted(props.items()))
            elif args.action == "set":
                cat.update_namespace_properties(ident, updates={args.key: args.value})
                print(f"set {args.key}")
            else:
                out = cat.update_namespace_properties(ident, removals=[args.key])
                print("removed" if args.key in out["removed"] else "missing")
        else:
            t = cat.load_table(ident)
            props = t.properties
            if args.action == "get":
                if args.key:
                    print(props.get(args.key, ""))
                else:
                    _print_table(["key", "value"], sorted(props.items()))
            else:
                print("error: table property mutation requires a catalog commit", file=sys.stderr)
                return 1
        return 0

    if args.verb in ("tag", "branch", "drop-ref", "rollback", "expire", "rewrite-manifests", "orphans"):
        from . import maintenance as M
        from . import refs as R

        t = cat.load_table(to_identifier(args.identifier))
        if args.verb == "tag":
            t = R.create_tag(t, args.name, args.snapshot)
            print(f"tag {args.name} -> {t.metadata.refs[args.name].snapshot_id}")
        elif args.verb == "branch":
            t = R.create_branch(t, args.name, args.snapshot)
            print(f"branch {args.name} -> {t.metadata.refs[args.name].snapshot_id}")
        elif args.verb == "drop-ref":
            R.drop_ref(t, args.name)
            print(f"dropped ref {args.name}")
        elif args.verb == "rollback":
            t = R.rollback_to(t, args.snapshot)
            print(f"rolled back to snapshot {args.snapshot}")
        elif args.verb == "expire":
            before = len(t.metadata.snapshots)
            t = M.expire_snapshots(
                t, older_than_ms=args.older_than_ms, retain_last=args.retain_last
            )
            print(f"expired {before - len(t.metadata.snapshots)} snapshots")
        elif args.verb == "rewrite-manifests":
            t = M.rewrite_manifests(t)
            print("manifests rewritten")
        else:
            found = M.remove_orphan_files(t) if args.remove else M.orphan_files(t)
            if args.as_json:
                print(json.dumps(found))
            else:
                for pth in found:
                    print(pth)
        return 0

    if args.verb == "add-files":
        from .write import add_files as _add

        t = cat.load_table(to_identifier(args.identifier))
        t = _add(t, list(args.paths))
        print(f"added {len(args.paths)} files; snapshot {t.current_snapshot().snapshot_id}")
        return 0
    if args.verb == "analyze":
        # ANALYZE scans data -> needs a session, like compact/zorder
        from ..session import get_spark
        from .maintenance import compute_table_stats, table_ndv

        t = cat.load_table(to_identifier(args.identifier))
        if t.current_snapshot() is None:
            print(f"{args.identifier}: empty table (no snapshots) — nothing to analyze")
            return 0
        spark = get_spark("icegopher-cli")
        cols = args.columns.split(",") if args.columns else None
        t = compute_table_stats(
            t,
            spark,
            columns=cols,
            mode="approx" if args.approx else "exact",
            approx_rsd=args.rsd,
        )
        mode = f"approx (rsd={args.rsd})" if args.approx else "exact"
        print(f"ndv ({mode}): {json.dumps(table_ndv(t))}")
        return 0
    if args.verb == "partition-stats":
        from .partition_stats import compute_partition_stats

        t = cat.load_table(to_identifier(args.identifier))
        if t.current_snapshot() is None:
            print(f"{args.identifier}: empty table (no snapshots) — nothing to compute")
            return 0
        t = compute_partition_stats(t)
        entry = t.metadata.partition_statistics[-1]
        print(
            f"partition statistics for snapshot {entry['snapshot-id']}: "
            f"{entry['statistics-path']} ({entry['file-size-in-bytes']} bytes)"
        )
        return 0
    if args.verb == "delta-import":
        # mixed-estate onboarding: Delta log replay -> one Iceberg append
        from ..delta import read_delta
        from ..session import get_spark
        from .write import append as _append

        t = cat.load_table(to_identifier(args.identifier))
        spark = get_spark("icegopher-cli")
        df = read_delta(spark, args.delta_path, version=args.version)
        t = _append(t, df)
        print(
            f"imported Delta {args.delta_path} "
            f"(version {args.version if args.version is not None else 'latest'}) "
            f"-> snapshot {t.current_snapshot().snapshot_id}"
        )
        return 0
    if args.verb == "delta-export":
        from ..delta_write import export_iceberg_to_delta
        from ..session import get_spark

        t = cat.load_table(to_identifier(args.identifier))
        if t.current_snapshot() is None:
            print(f"{args.identifier}: empty table (no snapshots) — nothing to export")
            return 0
        spark = get_spark("icegopher-cli")
        parts = args.partition_by.split(",") if args.partition_by else None
        v = export_iceberg_to_delta(spark, t, args.delta_path, parts)
        print(f"exported {args.identifier} -> Delta {args.delta_path} (version {v})")
        return 0
    if args.verb == "register":
        if not hasattr(cat, "register_table"):
            print("error: this catalog cannot register external tables", file=sys.stderr)
            return 1
        t = cat.register_table(to_identifier(args.identifier), args.metadata_location)
        print(f"registered {args.identifier} at {t.metadata_location}")
        return 0

    if args.verb in ("compact", "zorder", "rewrite-deletes"):
        # the only verbs that move DATA (everything else is metadata-
        # plane): spin up a local session on demand
        from ..session import get_spark
        from . import maintenance as M

        t = cat.load_table(to_identifier(args.identifier))
        snap = t.current_snapshot()
        if snap is None:
            print(f"{args.identifier}: empty table (no snapshots) — nothing to rewrite")
            return 0
        spark = get_spark("icegopher-cli")

        def _nfiles(tbl):
            s = tbl.current_snapshot()
            return int(((s.summary if s else None) or {}).get("total-data-files", "0"))

        if args.verb == "rewrite-deletes":
            before_snap = t.current_snapshot().snapshot_id
            if args.equality:
                t = M.rewrite_equality_deletes(t, spark)
                eq_after = t.current_snapshot()
                if eq_after.snapshot_id != before_snap:
                    n_dv = (eq_after.summary or {}).get("added-delete-files", "?")
                    print(f"materialized equality deletes -> {n_dv} deletion vectors")
                before_snap = eq_after.snapshot_id
            t = M.rewrite_position_delete_files(t, spark)
            after = t.current_snapshot()
            if after.snapshot_id == before_snap:
                print(f"{args.identifier}: no positional-delete files to migrate")
            else:
                n_dv = (after.summary or {}).get("added-delete-files", "?")
                print(f"migrated positional deletes -> {n_dv} deletion vectors")
            return 0

        before = _nfiles(t)
        if args.verb == "compact":
            t = M.compact_data_files(t, spark)
            print(f"compacted: {before} -> {_nfiles(t)} data files")
        else:
            t = M.rewrite_clustered(t, spark, *args.cols, n_files=args.n_files)
            print(f"z-ordered on ({', '.join(args.cols)}): {before} -> {_nfiles(t)} data files")
        return 0

    if args.verb == "rename":
        cat.rename_table(to_identifier(args.src), to_identifier(args.dst))
        print(f"renamed {args.src} -> {args.dst}")
        return 0
    if args.verb == "drop":
        if args.entity == "table":
            cat.drop_table(to_identifier(args.identifier))
        else:
            cat.drop_namespace(to_identifier(args.identifier))
        print(f"dropped {args.identifier}")
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
