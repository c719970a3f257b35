"""Join / catalog operators.

Reference parity:
- ``join_vis``     — cngi/vis/join_vis.py:22-169: coordinate-aligned full
  outer merge of two xds with ``compat='no_conflicts'`` (xarray merge at
  :147): overlapping cells must be equal or one-sided-missing, else error.
- ``split_dataset`` — cngi/vis/split_dataset.py:23-166: select partitions
  out of an mxds and trim every subtable to only the key values still
  referenced (semi-join reduction, :81-154).
- ``join_dataset`` — cngi/vis/join_dataset.py:22-96 + machinery in
  cngi/_utils/_join_split.py:27-552: union two catalogs, re-keying
  colliding subtable ids in the second dataset and rewriting every
  referencing fact column through the remap.

Scale notes:
- join_vis is ONE full-outer sort-merge join on the cube keys; the
  conflict check is a lazy flag column — callers can ``validate`` (extra
  action, reads the joined output once) or trust upstream.
- split_dataset's trims are LEFT SEMI joins against ``SELECT DISTINCT
  key FROM fact``; the distinct side is tiny (dimension cardinality), so
  Catalyst broadcasts it — no full shuffle of the dimension tables.
- join_dataset's remap tables are dimension-sized; remapping fact FK
  columns is a broadcast-hash join, and the union is append-only —
  exactly the surrogate-key pattern a warehouse uses for catalog merge.


Subtable discovery/alignment helpers the reference needs
(``cngi/_utils/_mxds_ops.py``: get_subtables, primary-key-coordinate
guessing, dimension reassignment before concat) have no analog here by
design — the catalog IS a set of named tables with declared keys, so
"find the subtables and their primary keys" is dictionary iteration,
not heuristics over coordinate names."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cngi_prototype_spark.schema import DEFAULT_VIS, VisSchema


class JoinConflictError(RuntimeError):
    """Same cube cell carries different values in the two inputs
    (join_vis.py raises ``RuntimeError`` via xarray merge for this)."""


def join_vis(
    df1: DataFrame,
    df2: DataFrame,
    vs: VisSchema = DEFAULT_VIS,
    keys: list[str] | None = None,
    validate: bool = False,
    conflict_tol: float = 0.0,
    data_group: str | dict | None = None,
) -> DataFrame:
    """Full-outer coordinate join with no-conflicts semantics.

    Non-key columns present in both inputs are coalesced (left value
    wins where both present — but with ``validate=True`` a both-present
    disagreement beyond ``conflict_tol`` raises :class:`JoinConflictError`
    first, reproducing xarray's ``compat='no_conflicts'``).
    One-sided columns pass through (reference keeps the union of data
    variables).
    """
    if data_group is not None:
        from cngi_prototype_spark.operators.data_groups import (
            resolve_data_group,
        )
        vs = resolve_data_group(df1, data_group, base=vs)
    keys = keys or list(vs.keys)
    shared = [c for c in df1.columns if c in set(df2.columns) and c not in keys]
    only1 = [c for c in df1.columns if c not in set(df2.columns)]
    only2 = [c for c in df2.columns if c not in set(df1.columns)]

    a = df1.select(*keys, *[F.col(c).alias(f"__a_{c}") for c in shared], *only1)
    b = df2.select(*keys, *[F.col(c).alias(f"__b_{c}") for c in shared], *only2)
    joined = a.join(b, on=keys, how="full_outer")

    if validate and shared:
        conflict = F.lit(False)
        for c in shared:
            ac, bc = F.col(f"__a_{c}"), F.col(f"__b_{c}")
            both = ac.isNotNull() & bc.isNotNull()
            if conflict_tol > 0:
                neq = F.abs(ac.cast("double") - bc.cast("double")) > conflict_tol
            else:
                neq = ac != bc
            conflict = conflict | (both & neq)
        n_bad = joined.filter(conflict).limit(1).count()
        if n_bad:
            raise JoinConflictError(
                "join_vis: inputs disagree on overlapping cells "
                "(reference compat='no_conflicts', join_vis.py:101-112)"
            )

    out = joined.select(
        *keys,
        *[F.coalesce(F.col(f"__a_{c}"), F.col(f"__b_{c}")).alias(c) for c in shared],
        *only1,
        *only2,
    )
    return out


def split_dataset(
    fact: DataFrame,
    dims: dict[str, tuple[DataFrame, str, str]],
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Trim dimension tables to keys referenced by (an already filtered)
    fact table (split_dataset.py:81-154).

    ``dims`` maps name -> (dim_df, dim_key_col, fact_fk_col). Returns the
    fact unchanged plus each dim semi-joined against the fact's distinct
    FK values.
    """
    trimmed: dict[str, DataFrame] = {}
    for name, (dim, dim_key, fact_fk) in dims.items():
        used = fact.select(F.col(fact_fk).alias(dim_key)).distinct()
        trimmed[name] = dim.join(used, on=dim_key, how="left_semi")
    return fact, trimmed


def join_dataset(
    fact1: DataFrame,
    dim1: DataFrame,
    fact2: DataFrame,
    dim2: DataFrame,
    dim_key: str,
    fact_fk: str,
    match_on: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Union two (fact, dim) catalogs with surrogate-key reassignment
    (join_dataset.py:57-94; _join_split.py `_get_subtable_dimcoord_remap`).

    Dim rows of the second catalog that match a first-catalog row on
    ``match_on`` (natural key; default: all non-key columns) reuse the
    existing id; unmatched rows get fresh ids after the first catalog's
    max. Fact2's FK column is rewritten through the remap (broadcast
    join), then facts are unioned.
    """
    match_on = match_on or [c for c in dim2.columns if c != dim_key]

    d1 = dim1.select(dim_key, *match_on)
    d2 = dim2.select(F.col(dim_key).alias("__old_id"), *match_on)

    # ids of dim2 rows whose natural key already exists in dim1 -> reuse
    matched = d2.join(d1, on=match_on, how="inner").select(
        "__old_id", F.col(dim_key).alias("__new_id")
    )
    # unmatched dim2 rows -> fresh ids following dim1's max id
    max1 = dim1.agg(F.max(dim_key).alias("m"))
    unmatched = (
        d2.join(d1, on=match_on, how="left_anti")
        .withColumn(
            "__new_id",
            F.row_number().over(Window.orderBy("__old_id")) + F.lit(0),
        )
        .crossJoin(F.broadcast(max1))
        .select("__old_id", (F.col("__new_id") + F.col("m")).alias("__new_id"),
                *match_on)
    )
    remap = matched.unionByName(unmatched.select("__old_id", "__new_id"))

    new_dim_rows = unmatched.select(F.col("__new_id").alias(dim_key), *match_on)
    dim_out = dim1.select(dim_key, *match_on).unionByName(new_dim_rows)

    fact2_remapped = (
        fact2.join(
            F.broadcast(remap),
            fact2[fact_fk] == remap["__old_id"],
            "left",
        )
        .withColumn(fact_fk, F.coalesce(F.col("__new_id"), F.col(fact_fk)))
        .drop("__old_id", "__new_id")
    )
    fact_out = fact1.unionByName(fact2_remapped)
    return fact_out, dim_out
