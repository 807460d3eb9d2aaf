"""Durable ANN index state for LakeTable — the persisted half of the
LSH / IVF scale story.

The probe operators in ``operators/similarity.py`` compute the bucket /
inverted-list assignment as a scan-time expression: correct, but every
probe scans the whole corpus. The reference keeps its ANN index as
durable store-side state (reference: bear/config.py:23-35 — the HNSW
index params live on the collection; bear/model.py:131-141 — the index
is created once and reused by every search). The Spark-native
equivalent of "index as physical state" is PARTITION LAYOUT: materialize
the assignment as a ``_list`` partition column on disk, so probing N
lists reads exactly those lists' directories and never opens any other
file — probing IS partition pruning.

Layout under ``<table_root>/_index/<name>/``::

    meta.json                        atomic (os.replace): kind, params,
                                     fitted state (hyperplanes or
                                     centroids), built_from_version,
                                     data-dir token
    d-<token>/_list=<id>/*.parquet   id cols + vector column only,
                                     re-partitioned by assignment

The index data is a COPY (projection) of the table, like any secondary
index: the base table's physical layout is key-hash buckets chosen for
MERGE locality, so probe locality needs its own layout. Rebuilds write
a fresh ``d-<token>`` dir and swap ``meta.json`` atomically — a reader
mid-probe keeps its old directory listing, the superseded dir is
removed only after the swap (crash-safe: an orphaned dir is
unreferenced by meta.json and reclaimed by the next build).

At 100 TB: ``n_lists`` (or ``2**n_planes``) is sized so one list is a
few files (~sqrt(N) lists is the IVF norm); the assignment job is one
scan + one hash-partitioned shuffle write, i.e. the same cost class as
one merge of the full table, amortized over every subsequent probe.
Fitting the IVF quantizer samples the corpus — centroid quality needs
~256 points per list, never the full table.
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
import uuid
from typing import Any, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bear_spark.operators import similarity as S


class StaleVectorIndex(RuntimeError):
    """The table advanced past the version the index was built from."""


class VectorIndex:
    def __init__(self, table, name: str):
        self.table = table
        self.name = name
        self.root = os.path.join(table.root, "_index", name)
        # filled by the last _candidate_scan: {"lists_probed", "dirs",
        # "files_read", "files_total"} — the probe's pruning receipt
        self.last_probe: dict[str, Any] | None = None

    # ------------------------------------------------------------ meta
    @property
    def meta(self) -> dict[str, Any]:
        with open(os.path.join(self.root, "meta.json")) as f:
            return json.load(f)

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.root, "meta.json"))

    # ----------------------------------------------------------- build
    @classmethod
    def build(
        cls,
        table,
        name: str,
        vec_col: str = "embedding",
        id_cols: Sequence[str] | None = None,
        kind: str = "lsh",
        n_planes: int = 4,
        n_lists: int = 8,
        seed: int = 7,
        max_iter: int = 10,
        fit_sample: float | None = None,
        target_file_rows: int = 2_000_000,
        _state: list[list[float]] | None = None,
    ) -> "VectorIndex":
        """Materialize the assignment column as partition layout.

        ``_state`` (internal) injects already-fitted planes/centroids so
        ``refresh()`` reassigns without refitting — assignments stay
        comparable across index generations.
        """
        if kind not in ("lsh", "ivf"):
            raise ValueError(f"unknown index kind: {kind!r}")
        idx = cls(table, name)
        snap = table._snapshot()
        id_cols = list(id_cols or snap["key_cols"])
        df = table.read().select(*id_cols, vec_col)

        if _state is not None:
            state = _state
        elif kind == "lsh":
            dim = df.select(F.size(vec_col)).first()
            if dim is None:
                raise ValueError("cannot index an empty table without _state")
            state = S._planes(int(dim[0]), n_planes, seed)
        else:
            fit_df = df.sample(fit_sample, seed=seed) if fit_sample else df
            state = S.ivf_fit_centroids(
                fit_df, n_lists=n_lists, vec_col=vec_col, seed=seed, max_iter=max_iter
            )

        assign = (
            S.rp_lsh_bucket_expr(vec_col, state)
            if kind == "lsh"
            else S.ivf_assign_expr(vec_col, state)
        )
        token = uuid.uuid4().hex[:8]
        data_rel = f"d-{token}"
        out = os.path.join(idx.root, data_rel)
        os.makedirs(idx.root, exist_ok=True)
        # repartition by the assignment so each list's rows co-locate
        # into that list's directory with one writer per list;
        # maxRecordsPerFile bounds file size when a list is hot
        (
            df.withColumn("_list", assign)
            .repartition(F.col("_list"))
            .write.option("maxRecordsPerFile", target_file_rows)
            .partitionBy("_list")
            .parquet(out)
        )

        meta = {
            "kind": kind,
            "vec_col": vec_col,
            "id_cols": id_cols,
            "seed": seed,
            "n_planes": n_planes if kind == "lsh" else None,
            "n_lists": n_lists if kind == "ivf" else None,
            "state": state,  # hyperplanes (lsh) or centroids (ivf)
            "built_from_version": snap["version"],
            "data_rel": data_rel,
        }
        old_rel = idx.meta["data_rel"] if idx.exists() else None
        mpath = os.path.join(idx.root, "meta.json")
        tmp = f"{mpath}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, mpath)
        if old_rel and old_rel != data_rel:
            shutil.rmtree(os.path.join(idx.root, old_rel), ignore_errors=True)
        return idx

    def refresh(self) -> "VectorIndex":
        """Reassign against the table's CURRENT version, reusing the
        fitted planes/centroids (no refit — same hash family, so probe
        behavior is unchanged; only membership updates)."""
        m = self.meta
        return VectorIndex.build(
            self.table,
            self.name,
            vec_col=m["vec_col"],
            id_cols=m["id_cols"],
            kind=m["kind"],
            n_planes=m["n_planes"] or 4,
            n_lists=m["n_lists"] or 8,
            seed=m["seed"],
            _state=m["state"],
        )

    # ----------------------------------------------------------- probe
    def probe_lists(
        self, query: Sequence[float], n_probe: int = 2, max_probe_hamming: int = 2
    ) -> list[int]:
        """Driver-side list selection from the persisted index state —
        a handful of flops on one vector, never a Spark job."""
        m = self.meta
        qv = np.asarray(list(query), dtype=float)
        if m["kind"] == "ivf":
            d = [float(np.sum((qv - np.asarray(c)) ** 2)) for c in m["state"]]
            return sorted(int(i) for i in np.argsort(d)[:n_probe])
        qbucket = 0
        for i, p in enumerate(m["state"]):
            if float(np.dot(qv, np.asarray(p))) > 0:
                qbucket |= 1 << i
        # multi-probe: every bucket within max_probe_hamming bit flips
        nb = len(m["state"])
        lists = set()
        for h in range(max_probe_hamming + 1):
            for flips in itertools.combinations(range(nb), h):
                b = qbucket
                for i in flips:
                    b ^= 1 << i
                lists.add(b)
        return sorted(lists)

    def _candidate_scan(self, lists: Sequence[int]) -> DataFrame | None:
        """Read ONLY the probed lists' directories (partition pruning by
        construction: unlisted directories are never passed to the
        reader). Records the pruning receipt in ``last_probe``."""
        m = self.meta
        base = os.path.join(self.root, m["data_rel"])
        dirs = [
            os.path.join(base, f"_list={b}")
            for b in lists
            if os.path.isdir(os.path.join(base, f"_list={b}"))
        ]

        def _parquets(d: str) -> list[str]:
            return [
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]

        all_dirs = [
            os.path.join(base, d)
            for d in sorted(os.listdir(base))
            if d.startswith("_list=")
        ]
        self.last_probe = {
            "lists_probed": [int(b) for b in lists],
            "dirs": dirs,
            "files_read": [p for d in dirs for p in _parquets(d)],
            "files_total": sum(len(_parquets(d)) for d in all_dirs),
        }
        if not dirs:
            return None
        return self.table.spark.read.parquet(*dirs)

    def probe(
        self,
        query: Sequence[float],
        k: int = 10,
        n_probe: int = 2,
        max_probe_hamming: int = 2,
        allow_stale: bool = False,
    ) -> DataFrame:
        """ANN top-k against the persisted layout: prune to the probed
        lists' files, score exactly within them. Matches the scan-time
        operators (same hash family, same candidate set, same scoring)
        — the only difference is which files get opened."""
        m = self.meta
        current = self.table._version()
        if m["built_from_version"] != current and not allow_stale:
            raise StaleVectorIndex(
                f"index {self.name!r} built from v{m['built_from_version']} "
                f"but table is at v{current}; refresh() or allow_stale=True"
            )
        lists = self.probe_lists(query, n_probe=n_probe, max_probe_hamming=max_probe_hamming)
        cand = self._candidate_scan(lists)
        id_col = m["id_cols"][0]
        if cand is None:
            id_type = self.table.payload_schema()[id_col].dataType
            schema = T.StructType(
                [
                    T.StructField(id_col, id_type),
                    T.StructField("cos_sim", T.DoubleType()),
                ]
            )
            return self.table.spark.createDataFrame([], schema)
        q = F.array(*[F.lit(float(x)) for x in query])
        return (
            cand.select(
                id_col, F.round(S.cosine(F.col(m["vec_col"]), q), 6).alias("cos_sim")
            )
            .orderBy(F.desc("cos_sim"), id_col)
            .limit(k)
        )
