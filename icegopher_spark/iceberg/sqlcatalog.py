"""SQL-backed Iceberg catalog over stdlib sqlite3.

Implements the Iceberg *JDBC catalog* storage model (public spec /
iceberg-core JdbcCatalog, mirrored by pyiceberg's SqlCatalog): two
relational tables —

    iceberg_tables(catalog_name, table_namespace, table_name,
                   metadata_location, previous_metadata_location)
    iceberg_namespace_properties(catalog_name, namespace,
                                 property_key, property_value)

— where a table IS its current metadata-file pointer, and a commit is a
compare-and-swap on that pointer:

    UPDATE iceberg_tables SET metadata_location = :new
     WHERE ... AND metadata_location = :expected

Zero rows updated ⇒ a concurrent writer won ⇒ CommitFailedError (the
reference enumerates exactly this failure mode for its planned
catalogs, table/catalog/catalog.go:30-38 ErrCommitFailed — it only
implemented REST, rest.go; this closes the 'sql' member of its
CatalogType enum, table/catalog/catalog.go:16-24).

The commit handler speaks the same (requirements, updates) protocol as
the REST catalog so the write path (write.py::_commit_snapshot) is
catalog-agnostic: requirements are verified against the LATEST
metadata read from the DB row (not the writer's possibly-stale view),
updates are applied, the new metadata JSON is written to the
warehouse, and the pointer CAS-swaps.

Scale posture: the catalog stores POINTERS only — metadata JSON, Avro
manifests and parquet all live in the warehouse (object store at
scale). The DB sees one tiny row-update per commit regardless of data
volume, which is why the same design carries production JDBC catalogs
to 100 TB+ tables.
"""

from __future__ import annotations

import json
import os
import sqlite3
import uuid
from urllib.parse import urlparse

from .catalog import (
    CatalogError,
    NamespaceAlreadyExistsError,
    NoSuchNamespaceError,
    NoSuchTableError,
    to_identifier,
)
from .metadata import SnapshotRef, parse_metadata
from .table import Table

_EXISTS_KEY = "exists"  # marker row so empty namespaces persist (JDBC catalog convention)


def apply_table_commit(
    expected: str, table: Table, requirements: list[dict], updates: list[dict]
) -> tuple[Table, object, str]:
    """Shared (requirements, updates) commit application for
    pointer-swap catalogs (SQL, Hive): verify every requirement against
    the CURRENT metadata read from ``expected`` (not the writer's
    possibly-stale view), apply the update actions, write the new
    metadata JSON next to the table, and return (base_table,
    new_metadata, new_metadata_path). The caller performs its own
    atomic pointer compare-and-swap and raises CommitFailedError when
    the swap loses."""
    from .write import CommitFailedError

    base = Table.from_location(expected)
    md = base.metadata

    for req in requirements:
        kind = req.get("type")
        if kind == "assert-table-uuid":
            if md.table_uuid != req["uuid"]:
                raise CommitFailedError("table UUID changed")
        elif kind == "assert-ref-snapshot-id":
            ref = md.refs.get(req.get("ref", "main"))
            have = ref.snapshot_id if ref is not None else None
            if have != req.get("snapshot-id"):
                raise CommitFailedError(
                    f"ref {req.get('ref')!r} moved: expected"
                    f" {req.get('snapshot-id')}, found {have}"
                )
        else:
            raise CatalogError(f"unsupported requirement {kind!r}")

    raw = md.to_json_dict()
    for upd in updates:
        action = upd.get("action")
        if action == "add-snapshot":
            snap = upd["snapshot"]
            # snap ids/seqs were computed from the WRITER's possibly
            # stale metadata; the ref requirement only proves the
            # target branch didn't move. A commit to branch B after
            # someone committed to main would re-use main's new id —
            # snapshot_by_id would then resolve B to main's snapshot
            # (r6 review). Collision = stale writer: CAS-fail it.
            have_ids = {
                sn.get("snapshot-id") for sn in raw.get("snapshots", [])
            }
            if snap["snapshot-id"] in have_ids or snap.get(
                "sequence-number", 0
            ) <= raw.get("last-sequence-number", 0):
                raise CommitFailedError(
                    "snapshot id/sequence collision with a concurrent "
                    "commit; refresh and retry"
                )
            raw["snapshots"] = raw.get("snapshots", []) + [snap]
            raw["last-sequence-number"] = max(
                raw.get("last-sequence-number", 0), snap.get("sequence-number", 0)
            )
            raw["last-updated-ms"] = snap.get("timestamp-ms", raw.get("last-updated-ms"))
        elif action == "set-snapshot-ref":
            refs = dict(raw.get("refs", {}))
            refs[upd["ref-name"]] = SnapshotRef(
                upd["snapshot-id"],
                upd.get("type", "branch"),
                min_snapshots_to_keep=upd.get("min-snapshots-to-keep"),
                max_snapshot_age_ms=upd.get("max-snapshot-age-ms"),
                max_ref_age_ms=upd.get("max-ref-age-ms"),
            ).to_json_dict()
            raw["refs"] = refs
            if upd["ref-name"] == "main":
                raw["current-snapshot-id"] = upd["snapshot-id"]
                # ref-ONLY commits (rollback / fast-forward send no
                # add-snapshot) must stamp NOW: reusing the stale
                # last-updated-ms backdates the snapshot-log entry
                # and as-of time travel between the prior commit
                # and the rollback resolves to the rollback target
                # instead of what was current then (r6 review)
                if not any(
                    u.get("action") == "add-snapshot" for u in updates
                ):
                    import time as _time

                    raw["last-updated-ms"] = int(_time.time() * 1000)
                # snapshot-log tracks the MAIN lineage only (same
                # rule as the local commit path, write.py): logging
                # branch-staged snapshots here polluted as-of time
                # travel and history() with unpublished commits (r6)
                raw.setdefault("snapshot-log", []).append(
                    {
                        "snapshot-id": upd["snapshot-id"],
                        "timestamp-ms": raw.get("last-updated-ms", 0),
                    }
                )
        elif action == "remove-snapshot-ref":
            refs = dict(raw.get("refs", {}))
            refs.pop(upd["ref-name"], None)
            raw["refs"] = refs
        elif action == "remove-snapshots":
            gone = set(upd.get("snapshot-ids", []))
            raw["snapshots"] = [
                sn
                for sn in raw.get("snapshots", [])
                if sn.get("snapshot-id") not in gone
            ]
            raw["snapshot-log"] = [
                e
                for e in raw.get("snapshot-log", [])
                if e.get("snapshot-id") not in gone
            ]
        elif action == "add-schema":
            raw["schemas"] = raw.get("schemas", []) + [upd["schema"]]
            if "last-column-id" in upd:
                raw["last-column-id"] = max(
                    raw.get("last-column-id", 0), upd["last-column-id"]
                )
        elif action == "set-current-schema":
            raw["current-schema-id"] = upd["schema-id"]
        elif action == "add-spec":
            raw["partition-specs"] = raw.get("partition-specs", []) + [upd["spec"]]
            if "last-partition-id" in upd:
                raw["last-partition-id"] = max(
                    raw.get("last-partition-id", 0), upd["last-partition-id"]
                )
        elif action == "set-default-spec":
            raw["default-spec-id"] = upd["spec-id"]
        elif action == "set-properties":
            raw["properties"] = {**raw.get("properties", {}), **upd["updates"]}
        elif action == "remove-properties":
            props = dict(raw.get("properties", {}))
            for k in upd.get("removals", []):
                props.pop(k, None)
            raw["properties"] = props
        elif action == "set-partition-statistics":
            entry = upd["partition-statistics"]
            raw["partition-statistics"] = [
                e
                for e in raw.get("partition-statistics", [])
                if e.get("snapshot-id") != entry.get("snapshot-id")
            ] + [entry]
        elif action == "remove-partition-statistics":
            raw["partition-statistics"] = [
                e
                for e in raw.get("partition-statistics", [])
                if e.get("snapshot-id") != upd.get("snapshot-id")
            ]
        elif action == "set-statistics":
            entry = upd.get("statistics") or upd.get("statistics-file")
            if not entry or entry.get("snapshot-id") is None:
                # a snapshot-id-only (deprecated) or empty payload
                # would persist a junk {} entry forever — reject
                raise CatalogError(
                    "set-statistics requires a statistics file entry "
                    "with a snapshot-id"
                )
            raw["statistics"] = [
                e
                for e in raw.get("statistics", [])
                if e.get("snapshot-id") != entry.get("snapshot-id")
            ] + [entry]
        elif action == "remove-statistics":
            raw["statistics"] = [
                e
                for e in raw.get("statistics", [])
                if e.get("snapshot-id") != upd.get("snapshot-id")
            ]
        else:
            raise CatalogError(f"unsupported update action {action!r}")
    new_md = parse_metadata(raw)

    loc = md.location or os.path.dirname(os.path.dirname(expected))
    version = _parse_version(expected) + 1
    new_path = f"{loc}/metadata/{version:05d}-{uuid.uuid4().hex[:12]}.metadata.json"
    base.io.write(_local(new_path), json.dumps(new_md.to_json_dict()).encode())
    return base, new_md, new_path


class SqlCatalog:
    """sqlite3-backed catalog; URI ``sqlite:<path>`` (``:memory:`` works
    for tests but defeats cross-process atomicity)."""

    def __init__(self, name: str, uri: str, properties: dict[str, str] | None = None):
        self.name = name
        self.properties = dict(properties or {})
        # accept both sqlite:<path> and the jdbc:sqlite:<path> spelling
        # infer_catalog_type recognizes — the un-stripped jdbc: form was
        # passed verbatim to sqlite3.connect as a literal relative
        # filename (a './jdbc:sqlite:/...' directory tree) (r6)
        for prefix in ("jdbc:sqlite:", "sqlite:"):
            if uri.startswith(prefix):
                path = uri[len(prefix):]
                break
        else:
            path = uri
        self.warehouse = self.properties.get("warehouse", "").rstrip("/")
        if path != ":memory:":
            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        self._db = sqlite3.connect(path, check_same_thread=False)
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS iceberg_tables (
                 catalog_name TEXT NOT NULL,
                 table_namespace TEXT NOT NULL,
                 table_name TEXT NOT NULL,
                 metadata_location TEXT,
                 previous_metadata_location TEXT,
                 PRIMARY KEY (catalog_name, table_namespace, table_name))"""
        )
        self._db.execute(
            """CREATE TABLE IF NOT EXISTS iceberg_namespace_properties (
                 catalog_name TEXT NOT NULL,
                 namespace TEXT NOT NULL,
                 property_key TEXT NOT NULL,
                 property_value TEXT,
                 PRIMARY KEY (catalog_name, namespace, property_key))"""
        )
        self._db.commit()

    # -- helpers ---------------------------------------------------------

    def _split(self, identifier) -> tuple[str, str]:
        parts = to_identifier(identifier)
        if len(parts) < 2:
            raise CatalogError(f"identifier {identifier!r} needs namespace.table")
        return ".".join(parts[:-1]), parts[-1]

    def _pointer(self, identifier) -> str:
        ns, tbl = self._split(identifier)
        row = self._db.execute(
            "SELECT metadata_location FROM iceberg_tables"
            " WHERE catalog_name=? AND table_namespace=? AND table_name=?",
            (self.name, ns, tbl),
        ).fetchone()
        if row is None or row[0] is None:
            raise NoSuchTableError(f"table {identifier!r} not found in catalog {self.name}")
        return row[0]

    def _namespace_exists(self, ns: str) -> bool:
        q = self._db.execute(
            "SELECT 1 FROM iceberg_namespace_properties WHERE catalog_name=? AND namespace=?"
            " UNION SELECT 1 FROM iceberg_tables WHERE catalog_name=? AND table_namespace=?"
            " LIMIT 1",
            (self.name, ns, self.name, ns),
        ).fetchone()
        return q is not None

    # -- tables ----------------------------------------------------------

    def load_table(self, identifier) -> Table:
        t = Table.from_location(self._pointer(identifier))
        t.identifier = to_identifier(identifier)
        t.catalog = self
        return t

    def table_exists(self, identifier) -> bool:
        try:
            self._pointer(identifier)
            return True
        except NoSuchTableError:
            return False

    def create_table(self, identifier, schema, spec=None, properties=None) -> Table:
        from .write import create_table as _create

        ns, tbl = self._split(identifier)
        if not self._namespace_exists(ns):
            raise NoSuchNamespaceError(ns)
        if not self.warehouse:
            raise CatalogError("SqlCatalog needs a 'warehouse' property to create tables")
        if self.table_exists(identifier):
            # check BEFORE writing metadata files; the DB unique
            # constraint below still guards the racy window
            raise CatalogError(f"table {identifier!r} already exists")
        location = f"{self.warehouse}/{ns.replace('.', '/')}/{tbl}"
        t = _create(location, schema, spec, properties)
        try:
            self._db.execute(
                "INSERT INTO iceberg_tables VALUES (?,?,?,?,NULL)",
                (self.name, ns, tbl, t.metadata_location),
            )
            self._db.commit()
        except sqlite3.IntegrityError as e:
            raise CatalogError(f"table {identifier!r} already exists") from e
        t.identifier = to_identifier(identifier)
        t.catalog = self
        return t

    def register_table(self, identifier, metadata_location: str) -> Table:
        """Adopt an existing table by metadata path (no data movement)."""
        ns, tbl = self._split(identifier)
        try:
            self._db.execute(
                "INSERT INTO iceberg_tables VALUES (?,?,?,?,NULL)",
                (self.name, ns, tbl, metadata_location),
            )
            self._db.commit()
        except sqlite3.IntegrityError as e:
            raise CatalogError(f"table {identifier!r} already exists") from e
        return self.load_table(identifier)

    def drop_table(self, identifier) -> None:
        ns, tbl = self._split(identifier)
        cur = self._db.execute(
            "DELETE FROM iceberg_tables"
            " WHERE catalog_name=? AND table_namespace=? AND table_name=?",
            (self.name, ns, tbl),
        )
        self._db.commit()
        if cur.rowcount == 0:
            raise NoSuchTableError(str(identifier))

    def rename_table(self, src, dst) -> None:
        sns, stbl = self._split(src)
        dns, dtbl = self._split(dst)
        if not self._namespace_exists(dns):
            raise NoSuchNamespaceError(dns)
        try:
            cur = self._db.execute(
                "UPDATE iceberg_tables SET table_namespace=?, table_name=?"
                " WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                (dns, dtbl, self.name, sns, stbl),
            )
        except sqlite3.IntegrityError as e:
            raise CatalogError(f"table {dst!r} already exists") from e
        self._db.commit()
        if cur.rowcount == 0:
            raise NoSuchTableError(str(src))

    def list_tables(self, namespace) -> list[tuple[str, ...]]:
        ns = ".".join(to_identifier(namespace))
        if not self._namespace_exists(ns):
            raise NoSuchNamespaceError(str(namespace))
        rows = self._db.execute(
            "SELECT table_name FROM iceberg_tables"
            " WHERE catalog_name=? AND table_namespace=? ORDER BY table_name",
            (self.name, ns),
        ).fetchall()
        return [(*ns.split("."), r[0]) for r in rows]

    # -- commit (write-path hook, same protocol as RestCatalog) ----------

    def commit_table(self, table: Table, requirements: list[dict], updates: list[dict]) -> Table:
        """CAS commit: verify requirements against the DB's CURRENT
        metadata, apply the update actions, write a new metadata file,
        swap the pointer iff it still equals what we read."""
        from .write import CommitFailedError

        expected = self._pointer(table.identifier)
        base, new_md, new_path = apply_table_commit(
            expected, table, requirements, updates
        )

        ns, tbl = self._split(table.identifier)
        cur = self._db.execute(
            "UPDATE iceberg_tables SET metadata_location=?, previous_metadata_location=?"
            " WHERE catalog_name=? AND table_namespace=? AND table_name=?"
            "   AND metadata_location=?",
            (new_path, expected, self.name, ns, tbl, expected),
        )
        self._db.commit()
        if cur.rowcount == 0:
            raise CommitFailedError(
                f"concurrent update to {table.identifier!r}: pointer moved past {expected}"
            )
        table.metadata = new_md
        table.metadata_location = new_path
        return table

    # -- namespaces ------------------------------------------------------

    def list_namespaces(self) -> list[tuple[str, ...]]:
        rows = self._db.execute(
            "SELECT DISTINCT namespace FROM iceberg_namespace_properties WHERE catalog_name=?"
            " UNION SELECT DISTINCT table_namespace FROM iceberg_tables WHERE catalog_name=?"
            " ORDER BY 1",
            (self.name, self.name),
        ).fetchall()
        return [tuple(r[0].split(".")) for r in rows]

    def create_namespace(self, namespace, properties=None) -> None:
        ns = ".".join(to_identifier(namespace))
        if self._namespace_exists(ns):
            raise NamespaceAlreadyExistsError(ns)
        rows = [(self.name, ns, _EXISTS_KEY, "true")] + [
            (self.name, ns, k, v) for k, v in (properties or {}).items()
        ]
        self._db.executemany("INSERT INTO iceberg_namespace_properties VALUES (?,?,?,?)", rows)
        self._db.commit()

    def drop_namespace(self, namespace) -> None:
        ns = ".".join(to_identifier(namespace))
        if not self._namespace_exists(ns):
            raise NoSuchNamespaceError(ns)
        n_tables = self._db.execute(
            "SELECT COUNT(*) FROM iceberg_tables WHERE catalog_name=? AND table_namespace=?",
            (self.name, ns),
        ).fetchone()[0]
        if n_tables:
            raise CatalogError(f"namespace {ns!r} is not empty ({n_tables} tables)")
        self._db.execute(
            "DELETE FROM iceberg_namespace_properties WHERE catalog_name=? AND namespace=?",
            (self.name, ns),
        )
        self._db.commit()

    def load_namespace_properties(self, namespace) -> dict[str, str]:
        ns = ".".join(to_identifier(namespace))
        if not self._namespace_exists(ns):
            raise NoSuchNamespaceError(ns)
        rows = self._db.execute(
            "SELECT property_key, property_value FROM iceberg_namespace_properties"
            " WHERE catalog_name=? AND namespace=? AND property_key != ?",
            (self.name, ns, _EXISTS_KEY),
        ).fetchall()
        return dict(rows)

    def update_namespace_properties(
        self, namespace, removals: list[str] | None = None, updates: dict[str, str] | None = None
    ) -> dict[str, list[str]]:
        ns = ".".join(to_identifier(namespace))
        props = self.load_namespace_properties(namespace)
        removed, missing = [], []
        for k in removals or ():
            if k in props:
                removed.append(k)
            else:
                missing.append(k)
        self._db.executemany(
            "DELETE FROM iceberg_namespace_properties"
            " WHERE catalog_name=? AND namespace=? AND property_key=?",
            [(self.name, ns, k) for k in removed],
        )
        self._db.executemany(
            "INSERT OR REPLACE INTO iceberg_namespace_properties VALUES (?,?,?,?)",
            [(self.name, ns, k, v) for k, v in (updates or {}).items()],
        )
        self._db.commit()
        return {"removed": removed, "updated": list((updates or {}).keys()), "missing": missing}


def _parse_version(metadata_path: str) -> int:
    """v3.metadata.json → 3; 00007-<uuid>.metadata.json → 7; else 0."""
    stem = os.path.basename(metadata_path).split(".metadata.json")[0]
    head = stem.split("-")[0].lstrip("v")
    return int(head) if head.isdigit() else 0


def _local(path: str) -> str:
    p = urlparse(path)
    return p.path if p.scheme == "file" else path
