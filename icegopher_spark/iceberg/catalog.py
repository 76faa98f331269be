"""Catalogs: dispatch factory, static (filesystem) catalog, and the
REST catalog with OAuth2 client-credentials.

Reference semantics: table/catalog/catalog.go (types 40-47, URI
inference 49-62, LoadCatalog 99-125), table/catalog/rest.go (OAuth
201-242, config 272-309, table/namespace CRUD 388-557; namespace
separator \\x1f rest.go:40). HTTP via ``requests``; all driver-side.
"""

from __future__ import annotations

import json
from typing import Any
from urllib.parse import quote, urlparse

from .io import load_io
from .metadata import parse_metadata
from .table import Table

NAMESPACE_SEPARATOR = "\x1f"

CATALOG_REST = "rest"
CATALOG_HIVE = "hive"
CATALOG_GLUE = "glue"
CATALOG_DYNAMODB = "dynamodb"
CATALOG_SQL = "sql"
CATALOG_STATIC = "static"


class CatalogError(Exception):
    pass


class NoSuchTableError(CatalogError):
    pass


class NoSuchNamespaceError(CatalogError):
    pass


class NamespaceAlreadyExistsError(CatalogError):
    pass


def to_identifier(ident: str | tuple[str, ...] | list[str]) -> tuple[str, ...]:
    """Dotted string → tuple (reference catalog.go:71-80)."""
    if isinstance(ident, str):
        return tuple(ident.split("."))
    return tuple(ident)


def infer_catalog_type(uri: str) -> str:
    """(reference catalog.go:49-62)"""
    scheme = urlparse(uri).scheme
    if scheme in ("http", "https"):
        return CATALOG_REST
    if scheme == "thrift":
        return CATALOG_HIVE
    if scheme in ("sqlite", "jdbc"):
        return CATALOG_SQL
    if scheme in ("", "file"):
        return CATALOG_STATIC
    raise CatalogError(f"could not infer catalog type from uri {uri!r}")


def load_catalog(name: str, uri: str = "", properties: dict[str, str] | None = None):
    """Factory (reference LoadCatalog, catalog.go:99-125): explicit
    `type` property wins, else inferred from the URI scheme."""
    props = dict(properties or {})
    ctype = props.get("type") or infer_catalog_type(uri or props.get("uri", ""))
    if ctype == CATALOG_REST:
        return RestCatalog(name, uri or props.get("uri", ""), props)
    if ctype == CATALOG_SQL:
        from .sqlcatalog import SqlCatalog

        return SqlCatalog(name, uri or props.get("uri", ""), props)
    if ctype == CATALOG_STATIC:
        return StaticCatalog(name, uri or props.get("warehouse", ""), props)
    if ctype == CATALOG_HIVE:
        from .hivecatalog import HiveCatalog

        return HiveCatalog(name, uri or props.get("uri", ""), props)
    if ctype == CATALOG_GLUE:
        from .gluecatalog import GlueCatalog

        return GlueCatalog(name, uri or props.get("uri", ""), props)
    if ctype == CATALOG_DYNAMODB:
        from .dynamocatalog import DynamoDbCatalog

        return DynamoDbCatalog(name, uri or props.get("uri", ""), props)
    raise CatalogError(f"{ctype} catalog is not implemented")


class StaticCatalog:
    """Filesystem warehouse: namespaces are directories, tables are
    directories with metadata/version-hint.text. Pairs with the local
    write path (write.py) for a fully self-contained lakehouse."""

    def __init__(self, name: str, warehouse: str, properties: dict[str, str] | None = None):
        import os

        self.name = name
        self.warehouse = warehouse.rstrip("/")
        self.properties = properties or {}
        self._os = os

    def _table_path(self, identifier) -> str:
        parts = to_identifier(identifier)
        return "/".join([self.warehouse, *parts])

    def load_table(self, identifier) -> Table:
        path = self._table_path(identifier)
        try:
            t = Table.from_location(path)
        except (FileNotFoundError, ValueError) as e:
            raise NoSuchTableError(f"table {identifier!r} not found at {path}") from e
        t.identifier = to_identifier(identifier)
        t.catalog = self
        return t

    def table_exists(self, identifier) -> bool:
        path = self._table_path(identifier)
        return self._os.path.exists(f"{path}/metadata/version-hint.text")

    def create_table(self, identifier, schema, spec=None, properties=None) -> Table:
        from .write import create_table as _create

        path = self._table_path(identifier)
        if self.table_exists(identifier):
            raise CatalogError(f"table {identifier!r} already exists")
        t = _create(path, schema, spec, properties)
        t.identifier = to_identifier(identifier)
        t.catalog = self
        return t

    def drop_table(self, identifier) -> None:
        import shutil

        if not self.table_exists(identifier):
            raise NoSuchTableError(str(identifier))
        shutil.rmtree(self._table_path(identifier))

    def rename_table(self, src, dst) -> None:
        if not self.table_exists(src):
            raise NoSuchTableError(str(src))
        dst_path = self._table_path(dst)
        dst_ns = self._os.path.dirname(dst_path)
        if not self._os.path.isdir(dst_ns):
            # raw os.rename would raise FileNotFoundError (not a
            # CatalogError) for a missing destination namespace (r6)
            raise NoSuchNamespaceError(str(to_identifier(dst)[:-1]))
        if self._os.path.exists(dst_path):
            # rename(2) silently replaces an empty dst dir (r6)
            raise NamespaceAlreadyExistsError(f"{dst} already exists")
        self._os.rename(self._table_path(src), dst_path)

    def list_tables(self, namespace) -> list[tuple[str, ...]]:
        ns = to_identifier(namespace)
        base = "/".join([self.warehouse, *ns])
        if not self._os.path.isdir(base):
            raise NoSuchNamespaceError(str(namespace))
        out = []
        for d in sorted(self._os.listdir(base)):
            if self._os.path.exists(f"{base}/{d}/metadata/version-hint.text"):
                out.append((*ns, d))
        return out

    def list_namespaces(self) -> list[tuple[str, ...]]:
        if not self._os.path.isdir(self.warehouse):
            return []
        return [
            (d,)
            for d in sorted(self._os.listdir(self.warehouse))
            if self._os.path.isdir(f"{self.warehouse}/{d}")
            and not self._os.path.exists(f"{self.warehouse}/{d}/metadata/version-hint.text")
        ]

    def create_namespace(self, namespace, properties=None) -> None:
        base = "/".join([self.warehouse, *to_identifier(namespace)])
        if self._os.path.isdir(base):
            raise NamespaceAlreadyExistsError(str(namespace))
        self._os.makedirs(base)
        if properties:
            with open(f"{base}/.properties.json", "w") as f:
                json.dump(properties, f)

    def drop_namespace(self, namespace) -> None:
        base = "/".join([self.warehouse, *to_identifier(namespace)])
        if not self._os.path.isdir(base):
            raise NoSuchNamespaceError(str(namespace))
        # the namespace's own properties sidecar doesn't make it
        # non-empty — rmdir on it raised a raw OSError and a namespace
        # created WITH properties was undroppable (r6)
        props = f"{base}/.properties.json"
        leftover = [d for d in self._os.listdir(base) if d != ".properties.json"]
        if leftover:
            raise CatalogError(f"namespace {namespace} is not empty: {leftover}")
        if self._os.path.exists(props):
            self._os.remove(props)
        self._os.rmdir(base)

    def load_namespace_properties(self, namespace) -> dict[str, str]:
        base = "/".join([self.warehouse, *to_identifier(namespace)])
        if not self._os.path.isdir(base):
            raise NoSuchNamespaceError(str(namespace))
        try:
            with open(f"{base}/.properties.json") as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def update_namespace_properties(
        self, namespace, removals: list[str] | None = None, updates: dict[str, str] | None = None
    ) -> dict[str, list[str]]:
        props = self.load_namespace_properties(namespace)
        removed, missing = [], []
        for k in removals or ():
            if k in props:
                props.pop(k)
                removed.append(k)
            else:
                missing.append(k)
        for k, v in (updates or {}).items():
            props[k] = v
        base = "/".join([self.warehouse, *to_identifier(namespace)])
        with open(f"{base}/.properties.json", "w") as f:
            json.dump(props, f)
        return {"removed": removed, "updated": list((updates or {}).keys()), "missing": missing}


class RestCatalog:
    """Iceberg REST catalog client (reference rest.go).

    Auth: optional OAuth2 client-credentials flow (`credential`
    property as "client_id:client_secret") exchanged at
    /v1/oauth/tokens for a bearer token injected on every call
    (reference rest.go:201-242); or a pre-issued `token` property.
    """

    def __init__(self, name: str, uri: str, properties: dict[str, str] | None = None):
        import requests

        self.name = name
        self.uri = uri.rstrip("/")
        self.properties = dict(properties or {})
        self.session = requests.Session()
        self.session.headers["Content-Type"] = "application/json"
        self.session.headers["X-Client-Version"] = "0.14.1"
        if self.properties.get("token"):
            self.session.headers["Authorization"] = f"Bearer {self.properties['token']}"
        elif self.properties.get("credential"):
            self._fetch_token(self.properties["credential"])
        self._fetch_config()
        self.prefix = self.properties.get("prefix", "")
        # requested page size for paginated list endpoints; the server
        # may ignore it or pick its own (spec: pageSize is advisory)
        self.page_size = int(self.properties.get("rest.page-size", "0")) or None

    # -- plumbing --------------------------------------------------------

    def _fetch_token(self, credential: str) -> None:
        """(reference rest.go:201-242)"""
        if ":" in credential:
            client_id, client_secret = credential.split(":", 1)
        else:
            client_id, client_secret = "", credential
        resp = self.session.post(
            f"{self.uri}/v1/oauth/tokens",
            data={
                "grant_type": "client_credentials",
                "client_id": client_id,
                "client_secret": client_secret,
                "scope": self.properties.get("scope", "catalog"),
            },
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        self._check(resp)
        token = resp.json()["access_token"]
        self.session.headers["Authorization"] = f"Bearer {token}"

    def _fetch_config(self) -> None:
        """(reference rest.go:272-309): defaults ← our props ← overrides."""
        params = {}
        if self.properties.get("warehouse"):
            params["warehouse"] = self.properties["warehouse"]
        try:
            resp = self.session.get(f"{self.uri}/v1/config", params=params, timeout=30)
        except Exception:
            return  # unreachable at construction: fail on first real op
        if resp.status_code == 404:
            return  # config endpoint optional for some servers
        # anything else (401/403 bad credentials, 5xx, bad JSON) must
        # surface NOW — swallowing it made invalid credentials "succeed"
        # at connect time and dropped server-mandated overrides (r6)
        self._check(resp)
        cfg = resp.json()
        merged = dict(cfg.get("defaults", {}))
        merged.update(self.properties)
        merged.update(cfg.get("overrides", {}))
        self.properties = merged

    @staticmethod
    def _check(resp, not_found=NoSuchTableError) -> None:
        if resp.status_code == 404:
            raise not_found(resp.text)
        if resp.status_code == 409:
            raise NamespaceAlreadyExistsError(resp.text)
        if resp.status_code >= 400:
            raise CatalogError(f"HTTP {resp.status_code}: {resp.text}")

    def _url(self, *parts: str) -> str:
        base = f"{self.uri}/v1"
        if self.prefix:
            base = f"{base}/{quote(self.prefix, safe='')}"
        return "/".join([base, *parts])

    @staticmethod
    def _ns(namespace) -> str:
        return quote(NAMESPACE_SEPARATOR.join(to_identifier(namespace)), safe="")

    # -- tables ----------------------------------------------------------

    def load_table(self, identifier) -> Table:
        """(reference rest.go:388-416)"""
        ident = to_identifier(identifier)
        ns, tbl = ident[:-1], ident[-1]
        resp = self.session.get(self._url("namespaces", self._ns(ns), "tables", quote(tbl, safe="")))
        self._check(resp)
        payload = resp.json()
        md = parse_metadata(payload["metadata"])
        loc = payload.get("metadata-location", "")
        io = load_io(md.location or loc, self.properties)
        t = Table(ident, md, loc, io=io, catalog=self)
        return t

    def create_table(
        self, identifier, schema, spec=None, properties=None, location=None
    ) -> Table:
        """CreateTable over REST (POST .../tables): the service owns
        metadata construction and returns the initial document."""
        ident = to_identifier(identifier)
        ns, tbl = ident[:-1], ident[-1]
        body: dict = {
            "name": tbl,
            "schema": schema.to_json_dict(),
            "properties": properties or {},
        }
        if location:
            body["location"] = location
        if spec is not None and getattr(spec, "fields", None):
            body["partition-spec"] = {
                "spec-id": 0,
                "fields": [
                    {
                        "source-id": f.source_id,
                        "field-id": f.field_id,
                        "name": f.name,
                        "transform": str(f.transform),
                    }
                    for f in spec.fields
                ],
            }
        resp = self.session.post(self._url("namespaces", self._ns(ns), "tables"), json=body)
        self._check(resp)
        payload = resp.json()
        md = parse_metadata(payload["metadata"])
        loc = payload.get("metadata-location", "")
        io = load_io(md.location or loc, self.properties)
        return Table(ident, md, loc, io=io, catalog=self)

    def drop_table(self, identifier) -> None:
        ident = to_identifier(identifier)
        resp = self.session.delete(
            self._url("namespaces", self._ns(ident[:-1]), "tables", quote(ident[-1], safe=""))
        )
        self._check(resp)

    def rename_table(self, src, dst) -> None:
        s, d = to_identifier(src), to_identifier(dst)
        resp = self.session.post(
            self._url("tables", "rename"),
            json={
                "source": {"namespace": list(s[:-1]), "name": s[-1]},
                "destination": {"namespace": list(d[:-1]), "name": d[-1]},
            },
        )
        self._check(resp)

    def list_tables(self, namespace) -> list[tuple[str, ...]]:
        """All pages (public REST spec `page-token`/`pageSize` loop —
        the reference's single-shot GET, rest.go:463-493, silently
        truncates a 100k-table warehouse to the server's first page)."""
        out: list[tuple[str, ...]] = []
        for body in self._paged(
            self._url("namespaces", self._ns(namespace), "tables")
        ):
            out.extend(
                (*t["namespace"], t["name"]) for t in body.get("identifiers", [])
            )
        return out

    def _paged(self, url: str, params: dict | None = None):
        """Yield response bodies following `next-page-token` until the
        server stops returning one. The first request carries no
        page-token (spec: servers that don't paginate just return
        everything with no token — the loop degrades to one GET)."""
        params = dict(params or {})
        if self.page_size:
            params["pageSize"] = str(self.page_size)
        seen: set[str] = set()
        while True:
            resp = self.session.get(url, params=params)
            self._check(resp)
            body = resp.json()
            yield body
            token = body.get("next-page-token")
            if not token:
                return
            if token in seen:  # defend against a server echoing a token
                raise CatalogError(f"REST pagination loop: token {token!r} repeated")
            seen.add(token)
            params["pageToken"] = token

    def commit_table(self, table: Table, requirements: list[dict], updates: list[dict]) -> Table:
        """POST updates (write-path commit; reference enumerates
        ErrCommitFailed rest.go:51-52)."""
        ident = table.identifier
        resp = self.session.post(
            self._url("namespaces", self._ns(ident[:-1]), "tables", quote(ident[-1], safe="")),
            json={"requirements": requirements, "updates": updates},
        )
        if resp.status_code == 409:
            from .write import CommitFailedError

            raise CommitFailedError(resp.text)
        self._check(resp)
        payload = resp.json()
        table.metadata = parse_metadata(payload["metadata"])
        table.metadata_location = payload.get("metadata-location", table.metadata_location)
        return table

    # -- namespaces ------------------------------------------------------

    def list_namespaces(self, parent=None) -> list[tuple[str, ...]]:
        params = {}
        if parent:
            params["parent"] = NAMESPACE_SEPARATOR.join(to_identifier(parent))
        out: list[tuple[str, ...]] = []
        for body in self._paged(self._url("namespaces"), params):
            out.extend(tuple(ns) for ns in body.get("namespaces", []))
        return out

    def create_namespace(self, namespace, properties=None) -> None:
        resp = self.session.post(
            self._url("namespaces"),
            json={"namespace": list(to_identifier(namespace)), "properties": properties or {}},
        )
        self._check(resp)

    def drop_namespace(self, namespace) -> None:
        resp = self.session.delete(self._url("namespaces", self._ns(namespace)))
        self._check(resp, not_found=NoSuchNamespaceError)

    def load_namespace_properties(self, namespace) -> dict[str, str]:
        resp = self.session.get(self._url("namespaces", self._ns(namespace)))
        self._check(resp, not_found=NoSuchNamespaceError)
        return resp.json().get("properties", {})

    def update_namespace_properties(
        self, namespace, removals: list[str] | None = None, updates: dict[str, str] | None = None
    ) -> dict[str, list[str]]:
        """(reference rest.go:543-557)"""
        resp = self.session.post(
            self._url("namespaces", self._ns(namespace), "properties"),
            json={"removals": removals or [], "updates": updates or {}},
        )
        self._check(resp)
        body = resp.json()
        return {
            "removed": body.get("removed", []),
            "updated": body.get("updated", []),
            "missing": body.get("missing", []),
        }
