"""Model registry — N declared schemas → N lake tables + one search
surface.

The reference registers model classes in ``ALL_RESOURCES`` /
``ALL_CLUSTERS`` (reference: bear/model.py:231-239), derives one store
collection per registered model from its declared fields (reference:
bear/db.py:35-47 ``db_init`` iterating ``model_fields``), and fans
search out across the registered resource types (reference:
bear/search.py:113-122). The engine's analog: a ``TableSpec`` per
declared schema, ``ModelRegistry.create_all/load_all`` deriving one
``LakeTable`` each, and a unioned read/search surface that aligns the
tables onto their common-superset schema with a ``_type`` discriminator
column — the Spark-native "N collections, one query surface" shape
(schema alignment is the same ``reconcile.align`` cast-up the lake
already uses for schema evolution).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bear_spark.lake import LakeTable
from bear_spark.lake import reconcile


@dataclass(frozen=True)
class TableSpec:
    """One registered model: a declared schema plus its table policy
    (the information the reference carries on a model class + its
    collection config)."""

    name: str
    schema: T.StructType
    key_cols: tuple[str, ...]
    seq_col: str = "ts"
    num_buckets: int = 64
    lateness_sec: int = 3600
    drop_late: bool = False
    options: dict[str, Any] = field(default_factory=dict)


class ModelRegistry:
    """Registered specs → per-spec lake tables under one root.

    Directory layout: ``<root>/<spec.name>`` per table — the analog of
    one store collection per registered model.
    """

    def __init__(self, specs: Sequence[TableSpec]):
        names = [s.name for s in specs]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate spec names: {names}")
        self.specs: dict[str, TableSpec] = {s.name: s for s in specs}
        self.tables: dict[str, LakeTable] = {}

    # -- lifecycle -----------------------------------------------------
    def create_all(
        self, spark: SparkSession, root: str, overwrite: bool = False
    ) -> dict[str, LakeTable]:
        """DDL for every registered schema (reference: db_init creating
        one collection per model, bear/db.py:35-47)."""
        for name, s in self.specs.items():
            self.tables[name] = LakeTable.create(
                spark,
                os.path.join(root, name),
                s.schema,
                key_cols=list(s.key_cols),
                seq_col=s.seq_col,
                num_buckets=s.num_buckets,
                lateness_sec=s.lateness_sec,
                drop_late=s.drop_late,
                overwrite=overwrite,
                **s.options,
            )
        return dict(self.tables)

    def load_all(self, spark: SparkSession, root: str) -> dict[str, LakeTable]:
        for name in self.specs:
            self.tables[name] = LakeTable.load(spark, os.path.join(root, name))
        return dict(self.tables)

    def table(self, name: str) -> LakeTable:
        return self.tables[name]

    # -- unioned surfaces ---------------------------------------------
    def _union_schema(self) -> T.StructType:
        """Common-superset payload schema across all specs (first
        declaration of a column wins its type; conflicting types
        resolve through the same widening rules merge uses)."""
        out: list[T.StructField] = []
        have: dict[str, T.StructField] = {}
        for s in self.specs.values():
            for f in s.schema.fields:
                if f.name not in have:
                    fld = T.StructField(f.name, f.dataType, True)
                    have[f.name] = fld
                    out.append(fld)
                elif have[f.name].dataType != f.dataType:
                    widened, _ = reconcile.evolve(
                        T.StructType([have[f.name]]), T.StructType([f])
                    )
                    # replace rather than mutate: the field object is
                    # aliased into `out`, and in-place dataType writes on
                    # a shared StructField are an aliasing trap
                    repl = T.StructField(f.name, widened[f.name].dataType, True)
                    out[out.index(have[f.name])] = repl
                    have[f.name] = repl
        return T.StructType(out)

    def union_read(self, type_col: str = "_type") -> DataFrame:
        """All tables aligned onto the superset schema and unioned,
        with a ``type_col`` discriminator — the registry-wide scan
        (reference analog: iterating resource types and querying each
        collection, bear/search.py:113-122)."""
        target = self._union_schema()
        parts = []
        for name in self.specs:
            df = reconcile.align(self.tables[name].read(), target)
            parts.append(df.withColumn(type_col, F.lit(name)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def search(
        self,
        query_vec: list[float],
        vec_col: str = "embedding",
        id_col: str | None = None,
        top_k: int = 10,
        type_col: str = "_type",
        **search_kwargs: Any,
    ) -> DataFrame:
        """Fan search out over every registered table that declares
        ``vec_col``, union the per-type hits, and re-rank globally —
        per-type top-k first keeps the global sort input at
        O(types x k), not O(corpus)."""
        from bear_spark.search import SearchEngine

        parts = []
        for name, s in self.specs.items():
            if vec_col not in s.schema.fieldNames():
                continue
            part_id = id_col or s.key_cols[0]
            eng = SearchEngine(
                self.tables[name].read(),
                id_col=part_id,
                vec_col=vec_col,
            )
            hits = eng.search_resource(query_vec, top_k=top_k, **search_kwargs)
            parts.append(
                hits.withColumn(type_col, F.lit(name))
                # a stable tie-break id that exists in EVERY part: specs
                # may declare differently-named key columns, and a part
                # can be skipped entirely (no vector column), so sorting
                # by any one spec's key name would be unresolvable on
                # the union
                .withColumn("_sort_id", F.col(part_id).cast("string"))
            )
        if not parts:
            raise ValueError(f"no registered spec declares a {vec_col!r} column")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return (
            out.orderBy(F.desc("distance"), type_col, "_sort_id")
            .limit(top_k)
            .drop("_sort_id")
        )
