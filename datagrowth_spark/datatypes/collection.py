"""Collection — a named, keyed set of Documents backed by a DataFrame.

Re-expresses the reference Collection
(/root/reference/datagrowth/datatypes/documents/db/collection.py) with
immutable-snapshot semantics: every mutation returns/installs a new
DataFrame plan; persistence happens at dataset-version boundaries.

Scale notes (100 TB): all mutations are set-oriented single-shuffle
plans — ``add`` is a union + per-batch dedup, ``update`` is one keyed
join (broadcast when the update batch is small) + union, never a
driver-side loop. Identity derivation is a column expression so parquet
writes carry real ``identity`` columns for pushdown.
"""

from __future__ import annotations

import json
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datagrowth_spark.datatypes.document import (
    DOCUMENT_SCHEMA,
    content_col,
    decode_properties,
    document_content,
    encode_properties,
    prop_col,
)
from datagrowth_spark.functions.maps import merge_maps_last_win


class Collection:
    def __init__(
        self,
        spark: SparkSession,
        name: str = "collection",
        identifier: str | None = None,
        referee: str | None = None,
        df: DataFrame | None = None,
    ) -> None:
        self.spark = spark
        self.name = name
        self.identifier = identifier  # property path (no $ prefix), e.g. "id" or "a.b"
        self.referee = referee
        self._df = df if df is not None else spark.createDataFrame([], DOCUMENT_SCHEMA)
        # A collection that has never held rows: the first add() replaces
        # the frame instead of unioning onto the empty placeholder — the
        # placeholder carries default-parallelism empty partitions that
        # would otherwise pad EVERY downstream stage with no-op tasks
        # (32 extra Python workers per mapInPandas stage).
        self._pristine = df is None

    # -- plumbing ---------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def documents(self) -> DataFrame:
        return self._df

    def __len__(self) -> int:
        return self._df.count()

    def _rows_from_dicts(self, data: Iterable[dict[str, Any]]) -> DataFrame:
        rows = []
        seen_hashes = set()
        for item in data:
            if item is None:
                continue
            # in-memory dedup of identical payloads, mirroring add()'s
            # list-dedup (collection.py:126-133)
            payload = encode_properties(item)
            fingerprint = json.dumps(payload, sort_keys=True)
            if fingerprint in seen_hashes:
                continue
            seen_hashes.add(fingerprint)
            rows.append((None, None, payload, None, None, None, None))
        return self.spark.createDataFrame(rows, DOCUMENT_SCHEMA)

    def _conform(self, df: DataFrame) -> DataFrame:
        """Conform an arbitrary frame to DOCUMENT_SCHEMA.

        Lets operators that emit only ``properties`` (e.g. extract_df)
        feed straight into add/update; missing document columns become
        NULLs of the right type.
        """
        return df.select(*self._conform_cols(df))

    @staticmethod
    def _conform_cols(df: DataFrame) -> list[F.Column]:
        return [
            F.col(field.name).cast(field.dataType).alias(field.name)
            if field.name in df.columns
            else F.lit(None).cast(field.dataType).alias(field.name)
            for field in DOCUMENT_SCHEMA.fields
        ]

    def influence(self, df: DataFrame) -> DataFrame:
        """Derive identity/reference columns from the configured paths.

        Mirrors ``Collection.influence`` (collection.py:344-357): identity
        comes from the identifier path over properties, reference from the
        referee path; existing non-null values are preserved.
        """
        out = df
        if self.identifier:
            out = out.withColumn(
                "identity",
                F.coalesce(F.col("identity"), prop_col("properties", f"$.{self.identifier}")),
            )
        if self.referee:
            out = out.withColumn(
                "reference",
                F.coalesce(F.col("reference"), prop_col("properties", f"$.{self.referee}")),
            )
        return out

    # -- mutation ---------------------------------------------------------
    def add(self, data: Iterable[dict[str, Any]] | DataFrame, reset: bool = False) -> "Collection":
        """Bulk insert (C1). ``reset=True`` replaces the collection."""
        new = data if isinstance(data, DataFrame) else self._rows_from_dicts(data)
        new = self.influence(self._conform(new))
        self._df = new if (reset or self._pristine) else self._df.unionByName(new)
        self._pristine = False
        return self

    def update(self, data: Iterable[dict[str, Any]] | DataFrame, by_property: str,
               batch_size: int = 32, sequence: str | None = None) -> "Collection":
        """Upsert by property value (C2, collection.py:186-269).

        Incoming records are keyed by ``by_property``; matching target
        documents get a shallow dict-merge of properties (incoming keys
        win — Document.update semantics); records with no match insert as
        new documents. One keyed join + one anti-join, no driver loop.

        Ordering contract: when the same key appears more than once in the
        batch, the LAST occurrence wins. For list/iterator input that is
        list order (deterministic — the driver assigns positions before
        parallelizing). For DataFrame input "last" follows partition
        layout, which is only stable if the frame has a defined order —
        pass ``sequence`` naming a monotonic column (ingest timestamp,
        offset) to make the winner explicit.
        """
        if isinstance(data, DataFrame):
            updates, known_n = data, None
        else:
            data = list(data) if not isinstance(data, list) else data
            updates, known_n = self._rows_from_dicts(data), len(data)
        seq = (F.col(sequence) if sequence else F.monotonically_increasing_id()).alias("__seq")
        updates = updates.select(*self._conform_cols(updates), seq)
        key = prop_col("properties", f"$.{by_property}")
        # Last occurrence wins within the incoming batch.
        updates = (
            updates.withColumn("__key", key)
            .withColumn(
                "__rn",
                F.row_number().over(Window.partitionBy("__key").orderBy(F.desc("__seq"))),
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__seq")
        )
        target = self._df.withColumn("__key", key)
        upd = updates.select(
            F.col("__key").alias("__ukey"),
            F.col("properties").alias("__uprops"),
        )
        # Broadcast only when the update side is provably batch-sized
        # (driver-materialized input, reference batch=32). A bulk MERGE
        # from an arbitrary DataFrame is left to AQE's size-based join
        # selection — force-broadcasting it could OOM executors at scale.
        if known_n is not None and known_n <= 10_000:
            upd = F.broadcast(upd)
        merged = (
            target.join(upd, target["__key"] == F.col("__ukey"), "left")
            .withColumn(
                "properties",
                F.when(F.col("__ukey").isNotNull(),
                       merge_maps_last_win("properties", "__uprops"))
                .otherwise(F.col("properties")),
            )
            .drop("__key", "__ukey", "__uprops")
        )
        inserts = updates.join(target.select("__key"), "__key", "left_anti").drop("__key")
        self._df = merged.unionByName(self.influence(inserts))
        self._pristine = False
        return self

    def validate(self, schema: dict, raise_on_error: bool = True) -> DataFrame:
        """JSON-Schema validation of all documents (E11, collection.py:61-74).

        Returns the (identity, error) violations frame; with
        ``raise_on_error`` raises :class:`ValidationError` when non-empty.
        """
        from datagrowth_spark.datatypes.validation import validate, validation_errors

        if raise_on_error:
            validate(self._df, schema)
        return validation_errors(self._df, schema)

    # -- read side --------------------------------------------------------
    def content(self) -> list[dict[str, Any]]:
        """Driver-side merged content of every document (C4)."""
        return [document_content(row.asDict(recursive=True)) for row in self._df.collect()]

    def content_df(self) -> DataFrame:
        """DataFrame of merged content maps (values JSON-encoded)."""
        return self._df.select(
            "identity", "reference", content_col().alias("content")
        )

    def output(self, *args: Any) -> list[Any]:
        """Columnar projection via the output spec language (C7/E6/E7)."""
        from datagrowth_spark.functions.paths import output_from_content

        contents = self.content()
        if len(args) == 1 and isinstance(args[0], list):
            # list arg: produce one list per spec element across documents
            return [[output_from_content(c, spec) for c in contents] for spec in args[0]]
        return [output_from_content(c, *args) for c in contents]

    def group_by_df(self, key: str) -> DataFrame:
        """Distributed ``group_by`` (C5): one row per key value, members as
        an array of document structs — the pipeline form, nothing touches
        the driver. One shuffle; a heavily-skewed key concentrates its
        members in one task, which is inherent to the grouped-array
        semantics — aggregate over ``group_by_key`` instead when the
        per-group document list isn't actually needed.
        """
        return (
            self._df.withColumn("group_key", prop_col("properties", f"$.{key}"))
            .groupBy("group_key")
            .agg(F.collect_list(F.struct(*self._df.columns)).alias("documents"))
        )

    def group_by_key(self, key: str) -> DataFrame:
        """The documents frame with the group key attached as a real
        column — feed straight into ``groupBy("group_key").agg(...)`` for
        scalable (map-side combinable) per-group aggregation."""
        return self._df.withColumn("group_key", prop_col("properties", f"$.{key}"))

    def group_by(self, key: str) -> dict[Any, list[dict[str, Any]]]:
        """Group documents into {value: [content]} (C5, collection.py:326-342).

        Driver-side inspection form of :meth:`group_by_df`.
        """
        out: dict[Any, list[dict[str, Any]]] = {}
        for row in self.group_by_df(key).collect():
            raw = row["group_key"]
            value = json.loads(raw) if _looks_json(raw) else raw
            out[value] = [document_content(d.asDict(recursive=True)) for d in row["documents"]]
        return out

    def split(self, train: float = 0.8, validate: float = 0.1, test: float = 0.1,
              seed: int | None = None, as_content: bool = False):
        """Randomized train/validate/test split (C6, collection.py:289-308)."""
        assert abs(train + validate + test - 1.0) < 1e-9, "fractions must sum to 1"
        frames = self._df.randomSplit([train, validate, test], seed=seed)
        if as_content:
            return tuple(
                [document_content(r.asDict(recursive=True)) for r in f.collect()]
                for f in frames
            )
        return tuple(frames)

    def select_properties(self, *paths: str) -> DataFrame:
        """Typed projection of property paths into real columns."""
        cols = [prop_col("properties", p if p.startswith("$.") else f"$.{p}")
                .alias(p.split(".")[-1]) for p in paths]
        return self._df.select("identity", *cols)

    def to_typed(self, schema) -> DataFrame:
        """Convert to a typed struct frame — the scale path for analytics.

        ``schema`` is a StructType describing the payload; values are
        re-assembled into one JSON object string then parsed with
        ``from_json`` so parquet gets real columns (pruning + pushdown).
        """
        props = F.col("properties")
        obj = F.concat(
            F.lit("{"),
            F.array_join(
                F.transform(
                    F.map_entries(props),
                    lambda e: F.concat(
                        F.lit('"'),
                        F.regexp_replace(e["key"], r'(["\\])', r'\\$1'),
                        F.lit('":'),
                        e["value"],
                    ),
                ),
                ",",
            ),
            F.lit("}"),
        )
        return self._df.select(
            "identity", "reference",
            F.from_json(obj, schema).alias("properties"),
            "derivatives", "task_results", "pending_at", "finished_at",
        )

    # -- annotations (C10/C11) -------------------------------------------
    def annotations(self, annotations_df: DataFrame) -> DataFrame:
        """Annotations whose reference appears in this collection (semi-join)."""
        refs = self._df.select("reference").where(F.col("reference").isNotNull()).distinct()
        return annotations_df.join(F.broadcast(refs), "reference", "left_semi")

    def unannotated_sample(self, annotations_df: DataFrame, name: str, limit: int = 20,
                           seed: int | None = None) -> DataFrame:
        """Documents not yet annotated with `name`, random order, first N."""
        done = annotations_df.where(F.col("name") == name).select("reference").distinct()
        return (
            self._df.join(done, "reference", "left_anti")
            .orderBy(F.rand(seed))
            .limit(limit)
        )

    # -- io (C12) ---------------------------------------------------------
    def to_file(self, path: str, mode: str = "overwrite") -> None:
        self._df.write.mode(mode).parquet(path)

    @classmethod
    def from_file(cls, spark: SparkSession, path: str, name: str = "collection",
                  identifier: str | None = None, referee: str | None = None) -> "Collection":
        return cls(spark, name=name, identifier=identifier, referee=referee,
                   df=spark.read.parquet(path))


def _looks_json(value: str | None) -> bool:
    if value is None:
        return False
    value = value.strip()
    return value[:1] in "[{\"" or value in ("true", "false", "null") or _is_number(value)


def _is_number(value: str) -> bool:
    try:
        float(value)
        return True
    except ValueError:
        return False
