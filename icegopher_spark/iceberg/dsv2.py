"""Batch read/write of Iceberg tables through Spark 4's Python
DataSource API: `spark.read.format("icegopher")` and
`df.write.format("icegopher").mode("append"|"overwrite")`.

This is the *standard-Spark-API* face of the engine: jobs that speak
`DataFrameReader`/`DataFrameWriter` get our tables without importing
the library. Internals are the same metadata plane the native path
uses — `TableScan.plan_files` for planning, `collect_data_file` +
`_commit_snapshot`/`add_files` for the commit protocol.

Scale posture
  * Read: planning is driver-side O(manifests) with file pruning —
    Spark's pushed filters translate into the expression IR and prune
    through manifest summaries + min/max stats; every filter is
    reported back as unconsumed so Spark re-applies it exactly
    (pruning stays inclusive, residuals stay precise). Row IO is
    executor-side Arrow, one InputPartition per data file.
  * Write: executors write attempt-scoped parquet files and return
    their paths as commit messages; the driver commits ONLY the paths
    of successful attempts (task-commit protocol — a failed/speculated
    attempt's files are never harvested; they are swept later by
    remove_orphan_files). Append commits via footer-stats adoption
    (`add_files`), overwrite as one atomic OVERWRITE snapshot.

Known limits (documented, enforced):
  * Positional AND equality deletes are applied while the Arrow batches
    stream (per-file row-index mask; key-membership mask with
    sequence-number scoping resolved at plan time) — the per-file
    mirrors of the native path's `_metadata.row_index` /
    equality-field anti-joins.
  * Partitioned writes split each Arrow batch by the partition tuple
    (transforms applied per distinct source value, then a vectorized
    map), one file per (task, partition). Specs whose manifest value
    encoding would diverge from the native path (identity on
    timestamp/double) raise at plan time.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    InputPartition,
    WriterCommitMessage,
)


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        delete_paths: tuple[str, ...] = (),
        column_map: tuple[tuple[str, str | None], ...] | None = None,
        arrow_schema=None,
        eq_deletes: tuple[tuple[str, tuple[str, ...]], ...] = (),
        file_format: str = "PARQUET",
        dv_coords: tuple[tuple[str, int, int], ...] = (),
    ):
        self.path = path
        self.delete_paths = delete_paths
        # V3 deletion vectors for THIS file: (puffin path, content
        # offset, content size) — decoded executor-side to a row-index
        # mask, same as the parquet positional deletes
        self.dv_coords = dv_coords
        self.file_format = file_format
        # field-ID projection: (target name, name in THIS file | None if
        # the column didn't exist when the file was written)
        self.column_map = column_map
        self.arrow_schema = arrow_schema
        # equality deletes applying to THIS file (sequence-number
        # ordering already resolved at plan time): (delete file path,
        # key column names in the CURRENT schema)
        self.eq_deletes = eq_deletes


def resolve_location(options) -> str:
    """Table location from datasource options: either a direct
    ``location``, or ``catalog`` (URI / warehouse path; type inferred
    the same way ``load_catalog`` infers it) + ``table`` (dotted
    identifier) resolved through the catalog layer.

    READ-side resolution: catalog-managed tables resolve to their EXACT
    metadata-file location (the catalog's pointer), not the table
    directory — REST tables have no version-hint.text, so a directory
    load would fail or read stale metadata (r6 review). Write COMMITS
    load through the catalog instead (load_table_for_commit), so the
    pointer advances atomically via cat.commit_table."""
    if "location" in options:
        return options["location"]
    cat_uri = options.get("catalog")
    ident = options.get("table")
    if not (cat_uri and ident):
        raise ValueError(
            "datasource needs .option('location', path) or "
            ".option('catalog', uri) + .option('table', 'ns.tbl')"
        )
    from .catalog import load_catalog

    t = load_catalog("dsv2", cat_uri).load_table(tuple(ident.split(".")))
    return t.metadata_location or t.location


def load_table_for_commit(options):
    """Driver-side table handle for a WRITE commit. Catalog-managed
    tables load THROUGH the catalog so _commit_snapshot routes the
    commit via cat.commit_table (updating the catalog's metadata
    pointer atomically) — committing via the version-hint file would
    advance the table behind the catalog's back and catalog readers
    would never see it (r6 review)."""
    from .table import Table

    if "location" in options:
        return Table.from_location(options["location"])
    from .catalog import load_catalog

    return load_catalog("dsv2", options["catalog"]).load_table(
        tuple(options["table"].split("."))
    )


def column_map_for(file_schema, current):
    """Field-ID projection plan: (current name, name in the file |
    None if the field didn't exist when the file was written, V3
    initial-default in arrow Python form | None). None when the file
    schema IS the current schema (no projection)."""
    if file_schema is current:
        return None
    from .defaults import default_arrow_value

    out = []
    for f in current.fields:
        old = file_schema.find_field(f.field_id)
        out.append(
            (
                f.name,
                old.name if old is not None else None,
                default_arrow_value(f) if old is None else None,
            )
        )
    return tuple(out)


def project_batches(batches, column_map, arrow_schema):
    """Schema-evolution projection over an Arrow batch stream: rename
    by field ID, null-fill added columns, cast promoted types —
    zero-copy when the arrow type already matches."""
    import pyarrow as pa

    fill_scalars: dict[str, object] = {}
    for b in batches:
        cols = []
        for field, (_tname, old, dflt) in zip(arrow_schema, column_map):
            if old is None or b.schema.get_field_index(old) < 0:
                # dflt is only ever set for old is None (field postdates
                # the file → V3 initial-default); a column the file's own
                # schema declares but the footer lacks stays null
                if dflt is not None and old is None:
                    # arrow-native constant replication: convert the
                    # Python default ONCE, not O(rows) per batch
                    sc = fill_scalars.get(field.name)
                    if sc is None:
                        sc = pa.array([dflt], type=field.type)[0]
                        fill_scalars[field.name] = sc
                    cols.append(pa.repeat(sc, b.num_rows))
                else:
                    cols.append(pa.nulls(b.num_rows, type=field.type))
            else:
                c = b.column(b.schema.get_field_index(old))
                if c.type != field.type:
                    c = c.cast(field.type)
                cols.append(c)
        yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)


def _translate_filters(filters):
    """Spark pushed Filters -> our expression IR (AND of the ones we
    understand). Unknown filters are simply not used for pruning —
    they are all re-applied by Spark anyway."""
    from . import expressions as E

    out = None
    for f in filters:
        kind = type(f).__name__
        negated = False
        if kind == "Not":
            f = f.child
            kind = type(f).__name__
            negated = True
        try:
            col = ".".join(f.attribute)
        except AttributeError:
            continue
        pred = None
        if negated:
            # only the negations with an exact IR counterpart
            if kind == "EqualTo":
                pred = E.not_equal_to(col, f.value)
            elif kind == "In":
                pred = E.not_in(col, *f.value)
            elif kind == "IsNull":
                pred = E.not_null(col)
            elif kind == "IsNotNull":
                pred = E.is_null(col)
            if pred is not None:
                out = pred if out is None else out & pred
            continue
        if kind == "EqualTo":
            pred = E.equal_to(col, f.value)
        elif kind == "GreaterThan":
            pred = E.greater_than(col, f.value)
        elif kind == "GreaterThanOrEqual":
            pred = E.greater_than_or_equal(col, f.value)
        elif kind == "LessThan":
            pred = E.less_than(col, f.value)
        elif kind == "LessThanOrEqual":
            pred = E.less_than_or_equal(col, f.value)
        elif kind == "In":
            pred = E.is_in(col, *f.value)
        elif kind == "IsNull":
            pred = E.is_null(col)
        elif kind == "IsNotNull":
            pred = E.not_null(col)
        elif kind == "StringStartsWith":
            pred = E.starts_with(col, f.value)
        if pred is not None:
            out = pred if out is None else out & pred
    return out


class _BatchReader(DataSourceReader):
    """Base reader WITHOUT pushFilters: merely implementing that method
    makes Spark raise DATA_SOURCE_PUSHDOWN_DISABLED when
    spark.sql.python.filterPushdown.enabled is false (the default), so
    the pushdown variant is a subclass selected per-session."""

    def __init__(self, options):
        self.location = resolve_location(options)
        self.snapshot_id = options.get("snapshot-id")
        self._row_filter = None

    def partitions(self):
        from .table import Table

        t = Table.from_location(self.location)
        kwargs = {}
        if self.snapshot_id:
            kwargs["snapshot_id"] = int(self.snapshot_id)
        if self._row_filter is not None:
            kwargs["row_filter"] = self._row_filter
        scan = t.scan(**kwargs)
        tasks = scan.plan_files()
        from pyspark.sql.pandas.types import to_arrow_schema

        # under explicit time travel the SNAPSHOT's schema governs
        # (same contract as TableScan.projection and DataSource.schema;
        # the current schema would hide columns dropped since — r6)
        current = scan.projection()
        from .types import contains_variant as _has_var

        bad = [f.name for f in current.fields if _has_var(f.field_type)]
        if bad:
            # same refusal as the streaming planners (r8 review: the
            # batch face shares their executor pyarrow kernel, which
            # cannot open the variant logical type — without this the
            # failure is a raw OSError repeated across task retries)
            raise ValueError(
                f"the icegopher DataSource face cannot read variant "
                f"column(s) {bad}: its executor kernel reads parquet "
                "via pyarrow, which rejects the variant logical type — "
                "use table.scan().to_df(spark) (Spark-native variant)"
            )
        arrow_schema = to_arrow_schema(current.to_spark())
        md = t.metadata
        parts = []
        for task in tasks:
            fmt = task.file.file_format
            if fmt == "AVRO":
                # the Arrow read path has no Avro decoder with exact
                # Iceberg type coercion; refuse at PLAN time instead of
                # failing mid-read with parquet magic-byte errors (r6).
                # The native scan (Table.to_df) reads Avro tables.
                raise ValueError(
                    f"datasource read: {task.file.file_path} is AVRO; "
                    "the DataSource face reads PARQUET and ORC only — "
                    "use table.scan().to_df(spark) for Avro tables"
                )
            file_schema = (
                md.schema_by_id(task.schema_id) if task.schema_id is not None else None
            ) or current
            # rename-safe projection by field ID (the same contract
            # TableScan.to_df honors)
            cmap = column_map_for(file_schema, current)
            # equality deletes: plan_files already restricted each
            # task's eq_delete_files to strictly-larger sequence numbers
            # (ref semantics manifest.go:438-444); here we only resolve
            # the key field IDs to current-schema names, driver-side
            eq = []
            for d in task.eq_delete_files:
                names = []
                for fid in d.equality_ids or []:
                    f = current.find_field(fid)
                    if f is None:
                        # masking on a PARTIAL key would over-delete —
                        # refuse loudly instead (a dropped key column)
                        raise ValueError(
                            f"equality-delete file {d.file_path} keys on "
                            f"field id {fid}, which is not in the current "
                            "schema; cannot apply a partial key"
                        )
                    names.append(f.name)
                if names:
                    eq.append((d.file_path, tuple(names)))
            eq = tuple(eq)
            # ALL batches run the projection/cast step so the emitted
            # Arrow types match the declared schema exactly — zero-copy
            # when types already agree, and it absorbs representation
            # drift the footer alone can't prevent (ORC type coercions;
            # INT96 timestamps decoding as Timestamp(NANOSECOND) from
            # parquet files our own pre-r6 writer emitted)
            if cmap is None:
                cmap = tuple((f.name, f.name, None) for f in current.fields)
            parts.append(
                _FilePartition(
                    task.file.file_path,
                    tuple(
                        d.file_path
                        for d in task.delete_files
                        if not d.is_deletion_vector
                    ),
                    cmap,
                    arrow_schema if cmap is not None else None,
                    eq,
                    file_format=fmt,
                    dv_coords=tuple(
                        (d.file_path, d.content_offset, d.content_size_in_bytes or 0)
                        for d in task.delete_files
                        if d.is_deletion_vector
                    ),
                )
            )
        return parts or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        """Executor-side Arrow read; positional deletes for this file
        are applied in place by masking global row indices while the
        batches stream — the Arrow mirror of the anti-join the native
        path (`Table.to_df`) runs on `_metadata.row_index`."""
        if not partition.path:
            return iter([])
        import pyarrow.parquet as pq

        from .io import strip_scheme
        from .table import strip_file_scheme

        import numpy as np
        import pyarrow as pa

        if partition.file_format == "ORC":
            from pyarrow import orc as _orc

            def _orc_batches(path=strip_file_scheme(partition.path)):
                f = _orc.ORCFile(path)
                for i in range(f.nstripes):
                    tbl = f.read_stripe(i)
                    yield from (
                        tbl.to_batches() if hasattr(tbl, "to_batches") else [tbl]
                    )

            batches = _orc_batches()
        else:
            batches = pq.ParquetFile(strip_file_scheme(partition.path)).iter_batches()

        if partition.delete_paths or partition.dv_coords:
            # urlparse-based strip_scheme normalizes BOTH 'file:///x'
            # and the single-slash 'file:/x' form some writers emit —
            # the old exact 'file://' strip silently skipped deletes on
            # mixed URI forms (r6 review)
            my_path = strip_scheme(strip_file_scheme(partition.path))
            dead: set[int] = set()
            for puffin_path, dv_off, dv_len in partition.dv_coords:
                # V3 deletion vector: the bitmap is already scoped to
                # this file at plan time (referenced_data_file match) —
                # decode and mask, no path comparison needed
                from .io import load_io
                from .puffin import read_dv

                dv_data = load_io(puffin_path, {}).read(puffin_path)
                dead.update(
                    int(p) for p in read_dv(dv_data, dv_off, dv_len)
                )
            for dpath in partition.delete_paths:
                # push a file_path filter into the parquet read: delete
                # files are sorted by (file_path, pos) per the spec, so
                # row-group stats prune non-matching groups instead of
                # decoding the whole delete file once per data file
                try:
                    dt = pq.read_table(
                        strip_file_scheme(dpath),
                        columns=["file_path", "pos"],
                        filters=[
                            ("file_path", "in", [my_path, "file://" + my_path, "file:" + my_path])
                        ],
                    )
                except Exception:  # noqa: BLE001 - filter pushdown is best-effort
                    dt = pq.read_table(
                        strip_file_scheme(dpath), columns=["file_path", "pos"]
                    )
                for fp, pos in zip(dt["file_path"].to_pylist(), dt["pos"].to_pylist()):
                    if strip_scheme(fp) == my_path:
                        dead.add(pos)
            if dead:
                dead_arr = np.fromiter(dead, dtype=np.int64)
                raw = batches

                def _mask(src=raw):
                    offset = 0
                    for b in src:
                        keep = ~np.isin(
                            np.arange(offset, offset + b.num_rows), dead_arr
                        )
                        offset += b.num_rows
                        yield b if keep.all() else b.filter(pa.array(keep))

                batches = _mask()

        if partition.column_map is not None:
            batches = project_batches(
                batches, partition.column_map, partition.arrow_schema
            )
        if partition.eq_deletes:
            batches = _apply_eq_deletes(batches, partition.eq_deletes)
        return batches


def _apply_eq_deletes(batches, eq_deletes):
    """Equality-delete masking over an Arrow batch stream — the per-file
    mirror of the native path's `left_anti` join on the key field IDs
    (table.py:647-662), with the same null semantics: a null in any key
    column never matches (Spark's null-unsafe join equality), so
    null-keyed delete rows are dropped and null-keyed data rows are
    kept. Runs AFTER field-ID projection, so key names are the current
    schema's. Vectorized: pandas MultiIndex membership per batch."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .table import strip_file_scheme

    # (names, key frame) per delete file, keys deduped and null-purged;
    # only the key columns are read from the delete parquet
    keysets = []
    for dpath, names in eq_deletes:
        pf = pq.ParquetFile(strip_file_scheme(dpath))
        fcols = pf.schema_arrow.names
        # by-name when the file carries the key names (robust to column
        # reordering); positional (like toDF) only when names don't
        # match but widths agree
        if set(names) <= set(fcols):
            kt = pf.read(columns=list(names))
        elif len(fcols) == len(names):
            kt = pf.read(columns=fcols).rename_columns(list(names))
        else:
            raise ValueError(
                f"equality-delete file {dpath} columns {fcols} do not "
                f"match key columns {list(names)}"
            )
        # integer_object_nulls: int64 keys with nulls must NOT coerce to
        # float64 (ids above 2^53 would collapse; the native path
        # compares exact int64)
        kdf = (
            kt.select(list(names))
            .to_pandas(integer_object_nulls=True)
            .dropna()
            .drop_duplicates()
        )
        if not len(kdf):
            continue
        if len(names) == 1:
            keysets.append((names, set(kdf[names[0]].tolist())))
        else:
            keysets.append((names, pd.MultiIndex.from_frame(kdf)))

    for b in batches:
        keep = None
        for names, keys in keysets:
            cols = {
                n: b.column(b.schema.get_field_index(n)).to_pandas(
                    integer_object_nulls=True
                )
                for n in names
            }
            bdf = pd.DataFrame(cols)
            if len(names) == 1:
                match = bdf[names[0]].isin(keys) & bdf[names[0]].notna()
            else:
                match = pd.Series(pd.MultiIndex.from_frame(bdf).isin(keys)) & bdf.notna().all(
                    axis=1
                )
            keep = ~match if keep is None else keep & ~match
        if keep is None or keep.all():
            yield b
        else:
            yield b.filter(pa.array(keep.to_numpy()))


class _PushdownBatchReader(_BatchReader):
    """Adds pushed-filter file pruning — only safe to instantiate when
    spark.sql.python.filterPushdown.enabled is true in the session."""

    def pushFilters(self, filters):
        self._row_filter = _translate_filters(filters)
        # report EVERY filter unconsumed: we prune files with them but
        # rely on Spark for exact row-level application
        return filters


def _entry_data_file(entry, schema):
    """(path, partition[, nan_counts_by_name]) -> DataFile; write-time
    NaN tallies map to field ids here so the metrics evaluator can
    prune float gt/ge on pyarrow-written files too (r6)."""
    from .write import collect_data_file

    path, partition = entry[0], entry[1]
    nan_by_name = entry[2] if len(entry) > 2 else None
    nan_counts = None
    if nan_by_name is not None:
        nan_counts = {}
        for name, n in nan_by_name.items():
            f = schema.find_field(name)
            if f is not None:
                nan_counts[f.field_id] = n
    return collect_data_file(path, schema, partition, nan_value_counts=nan_counts)


class _TaskCommit(WriterCommitMessage):
    def __init__(self, entries):
        # list of (path, partition_dict) pairs
        self.entries = entries


class _BatchWriter(DataSourceArrowWriter):
    def __init__(self, options, overwrite: bool, part_fields):
        self.options = dict(options)
        self.location = resolve_location(options)
        self.overwrite = overwrite
        # picklable: [(spec field name, source column, Transform, IcebergType)]
        self.part_fields = part_fields
        # schema-alignment plan (driver-side, picklable): for every
        # table field, (name, arrow type, write-default in arrow Python
        # form | None) — executors fill columns absent from incoming
        # batches with the V3 write-default, exactly like the native
        # write path (write.py alignment select), and refuse loudly when
        # an absent column has no default.
        from pyspark.sql.pandas.types import to_arrow_type

        from .defaults import default_arrow_value
        from .types import to_spark_type

        t = load_table_for_commit(self.options)
        from .types import contains_variant

        bad = [f.name for f in t.schema.fields if contains_variant(f.field_type)]
        if bad:
            # the executor pq.ParquetWriter would emit a PLAIN
            # struct<metadata,value> without the parquet variant
            # logical-type annotation — a silently-committed file whose
            # physical type contradicts the table's declared VariantType
            # and fails long after the commit (r8 review wave 2). Spark's
            # own parquet writer annotates correctly: use W.append.
            raise ValueError(
                f"the icegopher DataSource face cannot WRITE variant "
                f"column(s) {bad}: its pyarrow writer would drop the "
                "variant logical-type annotation — write through "
                "iceberg.write.append (Spark-native variant) instead"
            )
        self.schema_plan = tuple(
            (
                f.name,
                to_arrow_type(to_spark_type(f.field_type)),
                default_arrow_value(f, "write"),
            )
            for f in t.schema.fields
        )

    def _align(self, batch, fill_cache):
        """Fill table columns missing from the incoming batch with
        their write-default (arrow-native constant replication)."""
        import pyarrow as pa

        missing = [
            p for p in self.schema_plan if batch.schema.get_field_index(p[0]) < 0
        ]
        if not missing:
            return batch
        arrays = list(batch.columns)
        fields = list(batch.schema)
        for name, atype, dflt in missing:
            if dflt is None:
                raise ValueError(
                    f"datasource write: input frame lacks column {name!r} "
                    "and the field has no write-default"
                )
            sc = fill_cache.get(name)
            if sc is None:
                sc = pa.array([dflt], type=atype)[0]
                fill_cache[name] = sc
            arrays.append(pa.repeat(sc, batch.num_rows))
            fields.append(pa.field(name, atype))
        return pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))

    def _partition_keys(self, batch):
        """Partition tuple per row: bucket transforms run through the
        vectorized murmur3 kernel (round-5; was per-distinct-value
        Python — quadratic pain on unique-key bucket sources); other
        transforms apply per DISTINCT source value (vectorized map
        afterwards). Encodings match the manifest representation."""
        import pandas as pd

        from .transforms import (
            BucketTransform,
            _coerce,
            _series_to_int64_encoding,
            bucket_series,
        )
        from .types import DateType, TimestampType, TimestampTzType

        cols = {}
        for name, src, tr, st in self.part_fields:
            # integer_object_nulls: a nullable int64 column otherwise
            # lands as float64, silently corrupting values >= 2^53
            # before they reach the bucket hash / transform (r6 review)
            s = batch.column(src).to_pandas(integer_object_nulls=True)
            if isinstance(tr, BucketTransform):
                cols[name] = bucket_series(s, tr.num_buckets, st)
                continue
            if isinstance(st, (DateType, TimestampType, TimestampTzType)):
                # encode to epoch days/µs ints FIRST: pd.unique on a
                # datetime64 series yields np.datetime64 values that
                # _coerce doesn't recognize, crashing (day/hour) or
                # mis-encoding (identity) the transform apply — the
                # int encodings are exactly what the transforms and
                # the manifest partition representation expect (r6)
                vals, mask = _series_to_int64_encoding(s, st)
                s = pd.Series(vals, dtype=object)
                s[mask] = None
            mapping = {
                v: tr.apply(_coerce(v, st), st) for v in pd.unique(s.dropna())
            }
            # object dtype, NOT s.map(mapping): map upcasts int results
            # to float64 whenever the batch holds a null, and the float
            # partition values crash the manifest int encoder at commit
            # (r6 review — pre-existing for any nullable source)
            cols[name] = pd.Series(
                [None if pd.isna(v) else mapping[v] for v in s],
                dtype=object,
                index=s.index,
            )
        return pd.DataFrame(cols)

    def write(self, iterator):
        """Executor side: attempt-scoped parquet files, one per
        (task, partition tuple)."""
        import os
        import uuid

        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark import TaskContext

        tc = TaskContext.get()
        attempt = tc.taskAttemptId() if tc else 0
        loc = self.location.removeprefix("file://")
        if loc.endswith(".json"):
            # catalog-resolved metadata file -> table root is two levels up
            import os as _os

            loc = _os.path.dirname(_os.path.dirname(loc))
        d = f"{loc}/data/dsw-{uuid.uuid4().hex[:16]}-a{attempt}"
        writers: dict[tuple, tuple] = {}  # key -> (ParquetWriter, path, partition)
        # NaN counts per (file, column) accumulated as batches stream —
        # pyarrow SKIPS NaN in parquet min/max stats, so unlike
        # parquet-mr files the footer can't prove NaN-freeness; without
        # these counts the metrics evaluator must stay conservative for
        # float gt/ge pruning on every dsv2-written file (r6)
        nan_acc: dict[tuple, dict[str, int]] = {}
        float_cols: list[str] | None = None

        def _sink(key, partition, batch):
            import pyarrow.compute as pc

            if key not in writers:
                os.makedirs(d, exist_ok=True)
                path = f"{d}/part-{len(writers)}.parquet"
                writers[key] = (pq.ParquetWriter(path, batch.schema), path, partition)
                nan_acc[key] = {}
            nonlocal float_cols
            if float_cols is None:
                float_cols = [
                    f.name for f in batch.schema if pa.types.is_floating(f.type)
                ]
            acc = nan_acc[key]
            for c in float_cols:
                n = pc.sum(
                    pc.is_nan(batch.column(batch.schema.get_field_index(c)))
                ).as_py()
                acc[c] = acc.get(c, 0) + int(n or 0)
            writers[key][0].write_batch(batch)

        fill_cache: dict[str, object] = {}
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            batch = self._align(batch, fill_cache)
            if not self.part_fields:
                _sink((), {}, batch)
                continue
            kdf = self._partition_keys(batch)
            names = list(kdf.columns)
            # exact grouping, NOT kdf.groupby: pandas coerces an object
            # key column holding ints+None to float64 group keys, which
            # corrupts the committed partition values (floats crash the
            # manifest int encoder) and would MERGE distinct int64
            # partitions above 2^53 into one file (r6 review).
            # pd.factorize hashes values exactly (C-speed even for
            # object dtype); combined radix codes split the row index,
            # with a pure-Python tuple fallback if the radix would
            # overflow int64 (only at absurd per-batch cardinalities).
            factored, cap = [], 1
            for n in names:
                c, u = pd.factorize(kdf[n], use_na_sentinel=False)
                factored.append((c, max(len(u), 1)))
                cap *= max(len(u), 1)
            if cap <= 2**62:
                codes = np.zeros(len(kdf), dtype=np.int64)
                for c, k in factored:
                    codes = codes * k + c
                order = np.argsort(codes, kind="stable")
                sc = codes[order]
                starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
                bounds = np.append(starts, len(sc))
                group_indices = [
                    order[bounds[i] : bounds[i + 1]] for i in range(len(starts))
                ]
            else:
                tup_groups: dict[tuple, list[int]] = {}
                for i, kk in enumerate(zip(*(kdf[n].tolist() for n in names))):
                    tup_groups.setdefault(kk, []).append(i)
                group_indices = [np.asarray(v) for v in tup_groups.values()]
            for idx in group_indices:
                row0 = int(idx[0])
                partition = {}
                for n in names:
                    v = kdf[n].iloc[row0]
                    # v may be None, float NaN, pandas NaT, or pd.NA
                    # (nullable Int32 from the vectorized bucket path) —
                    # all must normalize to a null partition value
                    if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
                        partition[n] = None
                    elif isinstance(v, (np.integer,)):
                        partition[n] = int(v)
                    else:
                        partition[n] = v
                _sink(tuple(sorted(partition.items())), partition,
                      batch.take(pa.array(np.asarray(idx, dtype=np.int64))))

        entries = []
        for key, (w, path, partition) in writers.items():
            w.close()
            entries.append((path, partition, nan_acc.get(key, {})))
        return _TaskCommit(entries)

    def commit(self, messages):
        """Driver side: harvest ONLY successful attempts' entries."""
        from .manifests import read_manifest_list
        from .metadata import OP_APPEND, OP_OVERWRITE
        from .table import Table
        from .write import _commit_snapshot, collect_data_file

        entries = [e for m in messages if m is not None for e in m.entries]
        t = load_table_for_commit(self.options)
        files = [_entry_data_file(e, t.schema) for e in entries]
        if self.overwrite:
            _commit_snapshot(t, files, OP_OVERWRITE, keep_manifests=[])
            return
        if not files:
            return
        snap = t.current_snapshot()
        keep = list(read_manifest_list(t.io.read(snap.manifest_list))) if snap else []
        _commit_snapshot(t, files, OP_APPEND, keep_manifests=keep)

    def abort(self, messages):
        import os
        import shutil

        for m in messages or []:
            if m is None:
                continue
            for e in m.entries:
                shutil.rmtree(os.path.dirname(e[0]), ignore_errors=True)


class IcebergDataSource(DataSource):
    """`spark.dataSource.register(IcebergDataSource)` then read/write
    with `.format("icegopher").option("location", table_path)`."""

    @classmethod
    def name(cls) -> str:
        return "icegopher"

    def schema(self):
        from .table import Table

        t = Table.from_location(resolve_location(self.options))
        snap = self.options.get("snapshot-id")
        if snap:
            # snapshot schema governs under explicit time travel —
            # must agree with what the reader's partitions() projects
            return t.scan(snapshot_id=int(snap)).projection().to_spark()
        return t.schema.to_spark()

    def reader(self, schema):
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        enabled = "false"
        if spark is not None:
            try:
                enabled = spark.conf.get(
                    "spark.sql.python.filterPushdown.enabled", "false"
                )
            except Exception:  # noqa: BLE001
                enabled = "false"
        if str(enabled).lower() == "true":
            return _PushdownBatchReader(self.options)
        # no pushed filters -> scan planning sees AlwaysTrue; Spark
        # still applies every filter row-level, so results are
        # identical — only file pruning is lost
        return _BatchReader(self.options)

    def _part_fields(self):
        """Resolve the partition spec DRIVER-side into a picklable
        plan; refuse (at plan time, before any executor writes a byte)
        the representations whose manifest encoding would diverge from
        the native write path (identity on timestamp/double)."""
        from .table import Table
        from .types import (
            DateType,
            IntegerType,
            LongType,
            StringType,
            TimestampType,
            TimestampTzType,
        )

        t = Table.from_location(resolve_location(self.options))
        ice_schema = t.schema
        part_fields = []
        for pf in t.metadata.default_spec.fields:
            src = ice_schema.find_field(pf.source_id)
            rt = pf.transform.result_type(src.field_type)
            # timestamp identity partitions encode as µs ints, same as
            # the native path's dir-parse representation (r6: was a
            # plan-time refusal). float/double stay refused: NaN/-0.0
            # partition-value grouping is ill-defined in pandas keys.
            if not isinstance(
                rt,
                (IntegerType, LongType, DateType, StringType, TimestampType, TimestampTzType),
            ):
                raise ValueError(
                    f"datasource write: unsupported partition value type {rt} "
                    f"for field {pf.name!r}; use write.append"
                )
            part_fields.append((pf.name, src.name, pf.transform, src.field_type))
        return part_fields

    def streamWriter(self, schema, overwrite: bool):
        return _IcebergStreamWriter(self.options, self._part_fields(), overwrite)

    def writer(self, schema, overwrite: bool):
        return _BatchWriter(self.options, overwrite, self._part_fields())


class _IcebergStreamWriter(DataSourceStreamArrowWriter):
    """Streaming sink face: one Iceberg snapshot per micro-batch, with
    exactly-once replay protection.

    The batch id rides the snapshot summary (atomic with the data
    commit); on commit, the current lineage is scanned for this
    stream's latest committed batch and replays are skipped. A restart
    therefore never double-appends a micro-batch — the idempotence
    Iceberg sinks get from commit-metadata epoch tracking. Caveat
    (standard for epoch markers): expiring EVERY snapshot of a stream
    discards its markers; keep `retain_last` above the replay horizon.
    """

    def __init__(self, options, part_fields, overwrite: bool = False):
        self.options = dict(options)
        self.location = resolve_location(options)
        self.stream_id = options.get("stream-id", "default")
        # Complete/truncate output mode: Spark hands overwrite=True and
        # each micro-batch must REPLACE the table contents — committing
        # appends instead silently accumulated duplicate aggregate rows
        # (r6 review)
        self.overwrite = overwrite
        self._delegate = _BatchWriter(options, overwrite=False, part_fields=part_fields)

    def write(self, iterator):
        return self._delegate.write(iterator)

    def _last_committed(self, t) -> int:
        """Newest-first lineage walk; batch ids are monotone per
        stream, so the FIRST marker found is the latest — O(snapshots
        since the stream's last commit), not O(lineage)."""
        md = t.metadata
        snap = t.current_snapshot()
        while snap is not None:
            s = snap.summary or {}
            if s.get("stream-id") == self.stream_id:
                return int(s.get("stream-batch-id", -1))
            snap = (
                md.snapshot_by_id(snap.parent_snapshot_id)
                if snap.parent_snapshot_id
                else None
            )
        return -1

    def commit(self, messages, batchId: int) -> None:
        from .manifests import read_manifest_list
        from .metadata import OP_APPEND, OP_OVERWRITE
        from .table import Table
        from .write import _commit_snapshot, collect_data_file

        entries = [e for m in messages if m is not None for e in m.entries]
        t = load_table_for_commit(self.options)
        if batchId <= self._last_committed(t):
            # replayed micro-batch after restart: drop its staged files
            self.abort(messages, batchId)
            return
        files = [_entry_data_file(e, t.schema) for e in entries]
        snap = t.current_snapshot()
        if self.overwrite:
            keep = []
            op = OP_OVERWRITE
        else:
            keep = list(read_manifest_list(t.io.read(snap.manifest_list))) if snap else []
            op = OP_APPEND
        _commit_snapshot(
            t,
            files,
            op,
            keep_manifests=keep,
            extra_summary={
                "stream-id": self.stream_id,
                "stream-batch-id": str(batchId),
            },
        )

    def abort(self, messages, batchId: int) -> None:
        import os
        import shutil

        for m in messages or []:
            if m is None:
                continue
            for e in m.entries:
                shutil.rmtree(os.path.dirname(e[0]), ignore_errors=True)
