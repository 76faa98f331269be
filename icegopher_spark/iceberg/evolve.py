"""Schema evolution: add / rename / drop / promote columns as
metadata-only commits, with field-ID-based reads so files written under
ANY historical schema project correctly into the current one.

Reference parity: the reference carries the machinery (field IDs,
per-snapshot schema-id, HighestFieldID visitor schema.go:273-276) but
no evolution operations; semantics follow the Iceberg spec — identity
is the field ID, never the name, so renames are free and old files
keep reading correctly.
"""

from __future__ import annotations

import time

from .metadata import parse_metadata
from .schema import Schema
from .table import Table
from .types import (
    DoubleType,
    FloatType,
    IcebergType,
    IntegerType,
    LongType,
    NestedField,
)
from .write import _commit_metadata, _loaded_version, _version_path

# legal primitive promotions (Iceberg spec)
_PROMOTIONS = {
    (IntegerType, LongType),
    (FloatType, DoubleType),
}


class UpdateSchema:
    """Builder: ``update_schema(t).add_column(...).rename_column(...)
    .commit()``."""

    def __init__(self, table: Table) -> None:
        self.table = table
        self._fields: list[NestedField] = list(table.schema.fields)
        self._next_id = table.metadata.last_column_id

    def _alloc_id(self) -> int:
        self._next_id += 1
        return self._next_id

    def add_column(
        self, name: str, field_type: IcebergType, doc: str | None = None, required: bool = False
    ) -> "UpdateSchema":
        if any(f.name == name for f in self._fields):
            raise ValueError(f"column {name!r} already exists")
        if required:
            # adding a required column to existing rows is illegal unless
            # a default is supplied; keep the simple rule
            raise ValueError("new columns must be optional (no default-value support)")
        self._fields.append(NestedField(self._alloc_id(), name, field_type, False, doc))
        return self

    def rename_column(self, old: str, new: str) -> "UpdateSchema":
        if not any(f.name == old for f in self._fields):
            raise ValueError(f"column {old!r} not found")
        if any(f.name == new for f in self._fields):
            raise ValueError(f"column {new!r} already exists")
        self._fields = [
            NestedField(f.field_id, new, f.field_type, f.required, f.doc)
            if f.name == old
            else f
            for f in self._fields
        ]
        return self

    def drop_column(self, name: str) -> "UpdateSchema":
        if not any(f.name == name for f in self._fields):
            raise ValueError(f"column {name!r} not found")
        used = {pf.source_id for pf in self.table.spec.fields}
        fid = next(f.field_id for f in self._fields if f.name == name)
        if fid in used:
            raise ValueError(f"column {name!r} is a partition source; cannot drop")
        self._fields = [f for f in self._fields if f.name != name]
        return self

    def update_column_type(self, name: str, new_type: IcebergType) -> "UpdateSchema":
        for i, f in enumerate(self._fields):
            if f.name == name:
                if (type(f.field_type), type(new_type)) not in _PROMOTIONS:
                    raise ValueError(
                        f"illegal promotion {f.field_type} -> {new_type} for {name!r}"
                    )
                self._fields[i] = NestedField(f.field_id, f.name, new_type, f.required, f.doc)
                return self
        raise ValueError(f"column {name!r} not found")

    def commit(self) -> Table:
        md = self.table.metadata
        new_schema_id = max(s.schema_id for s in md.schemas) + 1
        new_schema = Schema(
            tuple(self._fields),
            schema_id=new_schema_id,
            identifier_field_ids=tuple(
                i
                for i in md.current_schema.identifier_field_ids
                if any(f.field_id == i for f in self._fields)
            ),
        )
        raw = md.to_json_dict()
        raw["schemas"] = raw["schemas"] + [new_schema.to_json_dict()]
        raw["current-schema-id"] = new_schema_id
        raw["last-column-id"] = max(self._next_id, md.last_column_id)
        raw["last-updated-ms"] = int(time.time() * 1000)
        new_md = parse_metadata(raw)
        version = _loaded_version(self.table)
        _commit_metadata(self.table.io, md.location, new_md, expected_version=version)
        self.table.metadata = new_md
        self.table.metadata_location = _version_path(md.location, version + 1)
        return self.table


def update_schema(table: Table) -> UpdateSchema:
    return UpdateSchema(table)
