"""Pluggable file IO for driver-side metadata reads/writes.

Reference: io/io.go:48-64 (interface), io/local.go (local FS),
io/io.go:199-297 (S3 + scheme inference, properties like
`s3.region-name`/`s3.access-key-id`). Local + file:// is fully
implemented; S3 resolves through fsspec/s3fs when present (not in this
container) and otherwise raises with the same property contract, while
executor-side data reads always go through Spark's own Hadoop FS layer
(`fs.s3a.*`), which needs no Python S3 client.
"""

from __future__ import annotations

import os
from typing import Protocol
from urllib.parse import urlparse

S3_REGION = "s3.region-name"
S3_ACCESS_KEY = "s3.access-key-id"
S3_SECRET_KEY = "s3.secret-access-key"
S3_SESSION_TOKEN = "s3.session-token"
S3_ENDPOINT = "s3.endpoint"
S3_PROXY = "s3.proxy-uri"


class FileIO(Protocol):
    def read(self, path: str) -> bytes: ...
    def write(self, path: str, data: bytes) -> None: ...
    def remove(self, path: str) -> None: ...
    def exists(self, path: str) -> bool: ...
    def list_dir(self, path: str) -> list[str]: ...
    def remove_dir(self, path: str) -> None: ...


def strip_scheme(path: str) -> str:
    p = urlparse(path)
    if p.scheme in ("", "file"):
        return p.path or path
    return path


class LocalFileIO:
    """(reference io/local.go:22-30)"""

    def read(self, path: str) -> bytes:
        with open(strip_scheme(path), "rb") as f:
            return f.read()

    def write(self, path: str, data: bytes) -> None:
        path = strip_scheme(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # unique temp per writer: a FIXED path+'.tmp' let two concurrent
        # committers (e.g. both bumping version-hint.text) interleave
        # writes into one temp file and atomically install garbage (r6)
        import uuid as _uuid

        tmp = f"{path}.tmp-{_uuid.uuid4().hex[:8]}"
        try:
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    def remove(self, path: str) -> None:
        os.remove(strip_scheme(path))

    def exists(self, path: str) -> bool:
        return os.path.exists(strip_scheme(path))

    def list_dir(self, path: str) -> list[str]:
        """Child basenames; [] for a missing directory."""
        try:
            return os.listdir(strip_scheme(path))
        except OSError:
            return []

    def remove_dir(self, path: str) -> None:
        import shutil

        shutil.rmtree(strip_scheme(path), ignore_errors=True)


class S3FileIO:
    """S3 metadata IO via fsspec/s3fs if importable; property names match
    the reference (io/io.go:39-46, 199-273)."""

    def __init__(self, properties: dict[str, str] | None = None):
        props = properties or {}
        try:
            import s3fs  # type: ignore
        except ImportError as e:  # pragma: no cover - not in container
            raise ImportError(
                "s3fs is required for driver-side S3 metadata IO; "
                "executor-side data reads use Spark's fs.s3a.* instead"
            ) from e
        kwargs: dict = {}
        if props.get(S3_ACCESS_KEY):
            kwargs["key"] = props[S3_ACCESS_KEY]
        if props.get(S3_SECRET_KEY):
            kwargs["secret"] = props[S3_SECRET_KEY]
        if props.get(S3_SESSION_TOKEN):
            kwargs["token"] = props[S3_SESSION_TOKEN]
        client_kwargs: dict = {}
        if props.get(S3_REGION):
            client_kwargs["region_name"] = props[S3_REGION]
        if props.get(S3_ENDPOINT):
            client_kwargs["endpoint_url"] = props[S3_ENDPOINT]
        if client_kwargs:
            kwargs["client_kwargs"] = client_kwargs
        self.fs = s3fs.S3FileSystem(**kwargs)

    def read(self, path: str) -> bytes:
        with self.fs.open(path, "rb") as f:
            return f.read()

    def write(self, path: str, data: bytes) -> None:
        with self.fs.open(path, "wb") as f:
            f.write(data)

    def remove(self, path: str) -> None:
        self.fs.rm(path)

    def exists(self, path: str) -> bool:
        return self.fs.exists(path)

    def list_dir(self, path: str) -> list[str]:
        try:
            return [p.rstrip("/").rsplit("/", 1)[-1] for p in self.fs.ls(path)]
        except FileNotFoundError:
            return []

    def remove_dir(self, path: str) -> None:
        try:
            self.fs.rm(path, recursive=True)
        except FileNotFoundError:
            pass


def load_io(location: str, properties: dict[str, str] | None = None) -> FileIO:
    """Scheme inference (reference io/io.go:275-297): s3/s3a/s3n → S3,
    else local."""
    scheme = urlparse(location).scheme
    if scheme in ("s3", "s3a", "s3n"):
        return S3FileIO(properties)
    return LocalFileIO()
