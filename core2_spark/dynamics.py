"""Dynamic-schema normalization (SURVEY.md §1.2, M4).

core2 is schemaless-at-write: each sealed chunk records the Arrow types
actually present, and a column whose values disagree in type becomes a
dense union of "legs" (reference README.adoc:12 — "Complex and nested
data is automatically represented using Apache Arrow types").  Spark
has no union type, so the engine normalizes at read:

1. **Promotable widening** — if every observed leg fits one numeric
   ladder (byte → short → int → long → double) or nullability differs,
   cast all parts to the widest type and union them.
2. **Variant encoding** — true conflicts (e.g. long vs string vs
   struct) become a struct of nullable legs `v_<kind>`, one per
   observed type, exactly one non-null per row.  Dot-navigation then
   selects a leg (`col("x.v_str")`), mirroring core2's per-leg
   dispatch.

Missing columns in older files read as NULL (mergeSchema) — core2's
absent-field semantics.

At 100 TB: normalization is pure column algebra applied per-file at
scan time — no shuffle, no driver state; the widened schema is
computed once from Parquet footers (driver-side metadata only).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Numeric widening ladder (core2's promotable legs).
_LADDER = [
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
]


def _ladder_pos(dt: T.DataType) -> int | None:
    for i, t in enumerate(_LADDER):
        if dt == t:
            return i
    return None


def widen_type(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """Widest common type if promotable, else None (→ variant)."""
    if a == b:
        return a
    pa, pb = _ladder_pos(a), _ladder_pos(b)
    if pa is not None and pb is not None:
        return _LADDER[max(pa, pb)]
    return None


def _kind_tag(dt: T.DataType) -> str:
    """Short leg name for the variant struct field."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i64"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "f64"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.ArrayType):
        return "list"
    if isinstance(dt, T.StructType):
        return "struct"
    return "bin"


def _leg_storage(dt: T.DataType) -> T.DataType:
    """Canonical storage type for a variant leg."""
    tag = _kind_tag(dt)
    return {
        "i64": T.LongType(),
        "f64": T.DoubleType(),
        "str": T.StringType(),
        "bool": T.BooleanType(),
        "ts": T.TimestampType(),
        "date": T.DateType(),
    }.get(tag, dt)


def normalize_frames(frames: list[DataFrame]) -> DataFrame:
    """Union differently-shaped document batches into one DataFrame.

    Columns present in only some frames become NULL elsewhere
    (absent-field semantics); same-named columns with promotable types
    widen; true conflicts get the variant encoding.
    """
    if not frames:
        raise ValueError("no frames")
    if len(frames) == 1:
        return frames[0]

    # Observed types per column, in first-seen order.
    col_types: dict[str, list[T.DataType]] = {}
    for df in frames:
        for f in df.schema.fields:
            col_types.setdefault(f.name, [])
            if all(f.dataType != t for t in col_types[f.name]):
                col_types[f.name].append(f.dataType)

    plans: dict[str, tuple[str, object]] = {}
    for name, types in col_types.items():
        if len(types) == 1:
            plans[name] = ("as_is", types[0])
            continue
        widened = reduce(lambda acc, t: widen_type(acc, t) if acc else None, types)
        if widened is not None:
            plans[name] = ("widen", widened)
        else:
            legs: dict[str, T.DataType] = {}
            for t in types:
                legs.setdefault(_kind_tag(t), _leg_storage(t))
            plans[name] = ("variant", legs)

    def project(df: DataFrame) -> DataFrame:
        have = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for name, (mode, spec) in plans.items():
            if name not in have:
                if mode == "variant":
                    legs = spec
                    cols.append(
                        F.struct(
                            *[
                                F.lit(None).cast(leg_t).alias(f"v_{tag}")
                                for tag, leg_t in legs.items()
                            ]
                        ).alias(name)
                    )
                else:
                    target = spec if mode == "widen" else spec
                    cols.append(F.lit(None).cast(target).alias(name))
            elif mode == "as_is":
                cols.append(F.col(name))
            elif mode == "widen":
                cols.append(F.col(name).cast(spec).alias(name))
            else:  # variant
                legs = spec
                this_tag = _kind_tag(have[name])
                cols.append(
                    F.struct(
                        *[
                            (
                                F.col(name).cast(leg_t)
                                if tag == this_tag
                                else F.lit(None).cast(leg_t)
                            ).alias(f"v_{tag}")
                            for tag, leg_t in legs.items()
                        ]
                    ).alias(name)
                )
        return df.select(*cols)

    return reduce(lambda a, b: a.unionByName(project(b)), frames[1:], project(frames[0]))


def variant_leg(col_name: str, tag: str) -> F.Column:
    """Navigate a variant column to one leg (NULL when another leg is
    populated) — core2's per-leg union access."""
    return F.col(f"{col_name}.v_{tag}")
