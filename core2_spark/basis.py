"""Basis / repeatable reads (SURVEY.md §3.3, §1.1 transaction log).

core2 queries run at a *basis*: a pinned log position + clock, so the
same query re-run later returns identical results (reference
README.adoc:13 — deterministic transactions/indexing).  Without Delta
in this environment, the engine pins a basis as a **file manifest**:
the exact set of parquet files visible at basis-acquisition time plus
an explicit ``current_time``.  Readers load via the manifest, so files
appended afterwards are invisible — repeatable reads over an
append-only table directory.

At 100 TB this is exactly the Delta/Iceberg snapshot model (their
manifests do the same thing with statistics attached); ``Basis`` keeps
the engine's semantics identical so swapping the storage layer in is a
config change, not a redesign.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Basis:
    """A pinned snapshot: {table → exact file list} + query clock."""

    current_time: datetime
    manifests: dict[str, tuple[str, ...]] = field(default_factory=dict)
    # table → directory root; needed to resolve Hive-style partition
    # values (e.g. `_sys_day=2024-06-01/`) when reading explicit leaf
    # files from a partitioned version table.
    roots: dict[str, str] = field(default_factory=dict)
    # table → merged schema (StructType json string), maintained by
    # the engine at write time; lets reads pass an explicit schema and
    # skip the O(files) mergeSchema footer sweep at plan time.  Absent
    # entry → mergeSchema fallback.
    schemas: dict[str, str] = field(default_factory=dict)

    def read(
        self,
        spark: SparkSession,
        table: str,
        day_lo=None,
        day_hi=None,
    ) -> DataFrame:
        """Read the pinned file set, optionally MANIFEST-PRUNED by the
        ``_sys_day`` partition component of each path: files whose day
        falls outside ``[day_lo, day_hi]`` are dropped on the driver
        before Spark ever builds its file index.  PartitionFilters
        prune *row groups scanned*, but the file listing, schema merge
        and footer reads are still O(total files) — at deep history
        that planning cost grows linearly even for a one-day read.
        Manifest pruning (exactly what a Delta/Iceberg snapshot does
        with its manifest statistics) makes an as-of or changes-tail
        read O(files in range).  Flat legacy files carry no day in
        their path and are always kept — the row-level temporal
        predicates remain the source of truth."""
        files = self.manifests[table]
        if day_lo is not None or day_hi is not None:
            pruned = tuple(
                f
                for f in files
                if _file_day_in_range(f, day_lo, day_hi)
            )
            # never prune to zero: keep one file so the schema (and an
            # empty result via the row-level predicates) still resolves
            files = pruned if pruned else files[:1]
        # Version files may differ (e.g. tombstone rows carry no data
        # columns).  With the engine-maintained merged schema we read
        # with an EXPLICIT schema — absent fields come back NULL and
        # plan time does zero footer reads; without it (legacy roots,
        # type conflicts) fall back to a mergeSchema footer sweep.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from core2_spark.temporal import SYS_DAY, SYS_START

        cached = self.schemas.get(table)
        if cached is not None:
            import json as _json

            reader = spark.read.schema(T.StructType.fromJson(_json.loads(cached)))
        else:
            reader = spark.read.option("mergeSchema", "true")
        root = self.roots.get(table)
        part = tuple(f for f in files if f"{os.sep}{SYS_DAY}=" in f)
        if root is None or not part:
            return reader.parquet(*files)
        flat = tuple(f for f in files if f"{os.sep}{SYS_DAY}=" not in f)
        # basePath recovers the partition column from each leaf file's
        # directory name — but it silently DROPS any leaf that is not
        # under a partition directory, so a mixed-depth manifest (a
        # legacy flat-file root that later gained day-partitioned
        # appends) must be read as two scans and unioned, with the
        # flat files' `_sys_day` derived from their system-time column
        # (flat files predate the layout, so date(SYS_START) is exactly
        # what the partitioned writer would have stamped).
        df = reader.option("basePath", root).parquet(*part)
        if flat:
            legacy = spark.read.option("mergeSchema", "true").parquet(*flat)
            if SYS_DAY not in legacy.columns and SYS_START in legacy.columns:
                legacy = legacy.withColumn(
                    SYS_DAY, F.to_date(F.col(SYS_START))
                )
            df = df.unionByName(legacy, allowMissingColumns=True)
        return df


def basis_to_json(basis: Basis) -> str:
    """Serialize a basis to a portable token.  core2 passes a basis
    across request boundaries so a client can re-run any query against
    the exact snapshot later (README.adoc:13 — deterministic
    queries at a log position); the JSON token is this engine's
    equivalent: clock + pinned manifests + roots + schema cache."""
    import json

    return json.dumps(
        {
            "current_time": basis.current_time.isoformat(),
            "manifests": {t: list(fs) for t, fs in basis.manifests.items()},
            "roots": dict(basis.roots),
            "schemas": dict(basis.schemas),
        }
    )


def basis_from_json(token: str) -> Basis:
    """Rehydrate a basis token (see ``basis_to_json``).  Reads at the
    rehydrated basis answer identically as long as the pinned files
    still exist (Erase/optimize rewrites invalidate old manifests, as
    ever)."""
    import json

    d = json.loads(token)
    return Basis(
        current_time=datetime.fromisoformat(d["current_time"]),
        manifests={t: tuple(fs) for t, fs in d["manifests"].items()},
        roots=dict(d["roots"]),
        schemas=dict(d.get("schemas", {})),
    )


def _file_day_in_range(path: str, day_lo, day_hi) -> bool:
    """True if the file's ``_sys_day=`` path component (if any) falls
    in the closed [day_lo, day_hi] range; files without the component
    (flat legacy layout) are never pruned."""
    from core2_spark.temporal import SYS_DAY

    marker = f"{os.sep}{SYS_DAY}="
    i = path.find(marker)
    if i < 0:
        return True
    raw = path[i + len(marker) :].split(os.sep, 1)[0]
    try:
        from datetime import date

        day = date.fromisoformat(raw)
    except ValueError:
        return True  # unparseable partition value: keep, rows decide
    if day_lo is not None and day < day_lo:
        return False
    if day_hi is not None and day > day_hi:
        return False
    return True


def _list_parquet_files(path: str) -> tuple[str, ...]:
    if os.path.isfile(path):
        return (path,)
    out = []
    for root, _dirs, names in os.walk(path):
        for n in sorted(names):
            if n.endswith(".parquet"):
                out.append(os.path.join(root, n))
    return tuple(sorted(out))


def acquire_basis(
    table_paths: dict[str, str],
    current_time: datetime | str,
    schemas: dict[str, str] | None = None,
) -> Basis:
    """Snapshot the current file sets of the given tables.

    ``current_time`` is the query clock: queries must use it instead of
    the wall clock (core2's determinism rule — LOCALTIMESTAMP is
    basis-pinned, never `now()`).  ``schemas`` carries the engine's
    merged-schema cache (table → StructType json) so basis reads skip
    the mergeSchema footer sweep.
    """
    if isinstance(current_time, str):
        current_time = datetime.fromisoformat(current_time)
    return Basis(
        current_time=current_time,
        manifests={t: _list_parquet_files(p) for t, p in table_paths.items()},
        roots=dict(table_paths),
        schemas=dict(schemas or {}),
    )
