"""Export sinks with the reference's quirk semantics (SURVEY §2.8 K1/K2/K6/K7).

The reference writes CSV by appending dict rows with a one-level flatten and
a union-of-keys header (``src/storage.py:45-101``), JSON as a fixed
url/timestamp/data/media shape with humanized sizes
(``src/storage.py:122-191``), and dispatches on a storage-type string with a
warn-and-fall-back-to-CSV default (``src/storage.py:14-30``).

Spark-first re-expression:

* **flatten** (E20, ``src/storage.py:71-81``) is a projection: struct fields
  become ``{col}_{field}`` columns natively; map columns need the union of
  keys, which is ONE tiny aggregation over just the map column (distinct
  keys ≪ rows; at 100 TB this is a metadata-scale job, and callers that
  know the key set pass it explicitly and skip the action entirely).
* **union-of-keys across heterogeneous batches** (the CSV header quirk) is
  ``unionByName(allowMissingColumns=True)`` — absent keys become nulls,
  which DictWriter also emits as empty cells.
* **CSV/JSON writes** are directory sinks (one file per partition — the
  distributed equivalent of the reference's single growing file; coalesce(1)
  reproduces the single-file layout for small exports).
* **dispatch** mirrors the factory: unknown type → warn + CSV fallback.
  ``mongodb``/``sqlite`` are declared out of scope by SURVEY §2.8 (no driver
  jars in this sandbox) and raise a clear error instead of silently writing.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StructType

from frontier_engine.functions import humanize_size_col

# ---------------------------------------------------------------------------
# E20 — one-level flatten (src/storage.py:71-81)
# ---------------------------------------------------------------------------


def map_key_union(df: DataFrame, col: str) -> list[str]:
    """Distinct keys of a map column — the reference's union-of-fieldnames
    scan (src/storage.py:83-86), as one aggregation over ONLY the map keys
    (column-pruned scan; result is driver-small by construction)."""
    rows = (
        df.select(F.explode(F.map_keys(F.col(col))).alias("k"))
        .distinct()
        .collect()
    )
    return sorted(r["k"] for r in rows)


def flatten_one_level(df: DataFrame, map_keys: dict[str, list[str]] | None = None) -> DataFrame:
    """One-level dict flatten (E20): nested ``{col: {sub: v}}`` becomes
    ``{col}_{sub}`` columns; scalars pass through unchanged.

    Struct columns flatten natively (pure projection).  Map columns use
    ``map_keys[col]`` when provided, else the computed key union.  Deeper
    nesting stays nested — the reference only flattens ONE level.
    """
    out = []
    for field in df.schema.fields:
        if isinstance(field.dataType, StructType):
            for sub in field.dataType.fieldNames():
                out.append(F.col(f"{field.name}.{sub}").alias(f"{field.name}_{sub}"))
        elif isinstance(field.dataType, MapType):
            keys = (map_keys or {}).get(field.name)
            if keys is None:
                keys = map_key_union(df, field.name)
            for k in keys:
                out.append(F.col(field.name).getItem(k).alias(f"{field.name}_{k}"))
        else:
            out.append(F.col(field.name))
    return df.select(*out)


def union_of_keys(dfs: list[DataFrame]) -> DataFrame:
    """CSV header quirk (src/storage.py:83-90): the effective column set is
    the union over all batches; rows missing a column get nulls (DictWriter
    emits empty cells for absent keys)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


# ---------------------------------------------------------------------------
# K1 — CSV sink (src/storage.py:45-101)
# ---------------------------------------------------------------------------


def _csv_safe(df: DataFrame) -> DataFrame:
    """Columns still complex AFTER the one-level flatten (arrays, deeper
    structs) become JSON strings — the distributed analogue of DictWriter
    stringifying list/dict cells (the reference flattens exactly one level
    and writes ``str(value)`` for the rest)."""
    from pyspark.sql.types import ArrayType

    cols = [
        F.to_json(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def write_csv(df: DataFrame, path: str, mode: str = "append", single_file: bool = False) -> None:
    """Append-mode CSV export with the reference's flatten-then-write shape.

    Header handling: the reference writes the header only when the file is
    new (src/storage.py:69,92-93); Spark's directory sink writes a header
    per part file — the correct distributed equivalent (every file is
    self-describing; a downstream reader unions them).  ``single_file``
    coalesces to one partition for small exports that must byte-match the
    reference's one-file layout.
    """
    flat = _csv_safe(flatten_one_level(df))
    if single_file:
        flat = flat.coalesce(1)
    flat.write.mode(mode).option("header", True).csv(path)


# ---------------------------------------------------------------------------
# K2 — JSON sink, fixed shape + humanized sizes (src/storage.py:122-191)
# ---------------------------------------------------------------------------

_MEDIA_ITEM_FIELDS = ("filename", "original_url", "local_path")


def json_export_shape(df: DataFrame) -> DataFrame:
    """Project to the reference's fixed JSON item shape
    (src/storage.py:144-173):

        {url, timestamp, data, media: {images: [...], videos: [...]}}

    with each media item reduced to (filename, original_url, local_path,
    size) and ``size`` humanized (src/storage.py:163,172 → E18).  Missing
    url/data columns default to ''/empty exactly like ``item.get(...)``.
    All array work is native ``transform`` — no Python.
    """

    def fmt_items(col: str):
        if col not in df.columns:
            return F.array().cast(
                "array<struct<filename:string,original_url:string,local_path:string,size:string>>"
            )
        return F.transform(
            F.coalesce(F.col(col), F.array()),
            lambda m: F.struct(
                *[m.getField(f).cast("string").alias(f) for f in _MEDIA_ITEM_FIELDS],
                humanize_size_col(F.coalesce(m.getField("size"), F.lit(0))).alias("size"),
            ),
        )

    url = F.col("url") if "url" in df.columns else F.lit("")
    ts = F.col("timestamp").cast("string") if "timestamp" in df.columns else F.lit(None).cast("string")
    data = F.col("data") if "data" in df.columns else F.lit(None).cast("map<string,string>")
    return df.select(
        url.alias("url"),
        ts.alias("timestamp"),
        data.alias("data"),
        F.struct(
            fmt_items("images").alias("images"),
            fmt_items("videos").alias("videos"),
        ).alias("media"),
    )


def write_json(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """JSON export (the reference rewrites the whole file each save —
    src/storage.py:178; mode='overwrite' mirrors that)."""
    shaped = json_export_shape(df)
    if single_file:
        shaped = shaped.coalesce(1)
    shaped.write.mode(mode).json(path)


# ---------------------------------------------------------------------------
# K6 — plain export (post_process export block, src/main.py:208-222)
# ---------------------------------------------------------------------------


def export(df: DataFrame, fmt: str, path: str) -> None:
    """post_processing.export: csv/json/parquet (excel → csv with a warning;
    no xlsx writer at scale, and SURVEY scopes it to the csv twin)."""
    if fmt == "excel":
        warnings.warn("export format 'excel' not supported at scale, writing csv", stacklevel=2)
        fmt = "csv"
    if fmt == "csv":
        _csv_safe(flatten_one_level(df)).write.mode("overwrite").option("header", True).csv(path)
    elif fmt == "json":
        df.write.mode("overwrite").json(path)
    elif fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    else:
        raise ValueError(f"unknown export format: {fmt}")


# ---------------------------------------------------------------------------
# K7 — sink dispatch with CSV fallback (src/storage.py:14-30)
# ---------------------------------------------------------------------------

_OUT_OF_SCOPE = {
    "mongodb": "no MongoDB driver in scope (SURVEY §2.8 K3: out of scope)",
    "sqlite": "no JDBC sqlite driver in scope (SURVEY §2.8: out of scope)",
}


def get_sink(storage_type: str):
    """storage-type string → writer callable(df, path).  Unknown type warns
    and falls back to CSV (src/storage.py:26-28); explicitly-unsupported
    backends raise with the reason instead of writing nothing."""
    sinks = {"csv": write_csv, "json": write_json, "parquet": lambda df, path: df.write.mode("overwrite").parquet(path)}
    if storage_type in _OUT_OF_SCOPE:
        raise NotImplementedError(_OUT_OF_SCOPE[storage_type])
    if storage_type not in sinks:
        warnings.warn(f"Storage type {storage_type} not supported, falling back to CSV", stacklevel=2)
        storage_type = "csv"
    return sinks[storage_type]
