"""data_groups registry: named column-role sets on a vis table.

Reference parity: ``convert_ms`` stamps each xds with a
``data_groups`` attr mapping group ids to the column set an operator
should read/write — ``{'0': {'id': '0', 'data': 'DATA', 'uvw': 'UVW',
'flag': 'FLAG', 'weight': 'DATA_WEIGHT'}, '1': {...CORRECTED_DATA...}}``
(``/root/reference/cngi/conversion/convert_ms.py:180-184``), and every
ngcasa operator resolves its ``sel_parms['data_group_in']`` through
``_check_sel_parms`` (``cngi/_utils/_check_parms.py``), asserting the
id exists and splicing in defaults.

Here the same contract rides the engine's :class:`VisSchema`: a group
is a role → column mapping; resolving one returns a VisSchema the
operators already consume (``vs=`` / ``data_group=`` args), validated
against the DataFrame's actual columns (the _check_sel_parms assert,
with a clear message instead of a print+assert). Groups persist as a
sidecar ``_data_groups.json`` in a parquet vis store — the attrs slot
of the zarr xds, Spark-store flavored.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame

from cngi_prototype_spark.schema import DEFAULT_VIS, VisSchema

GROUPS_FILE = "_data_groups.json"


def data_groups_from_columns(columns: list[str]) -> dict[str, dict]:
    """Auto-derive the registry the way convert_ms does (180-184): one
    group per complex data variable present, each with the matching
    weight and shared flag/uvw roles."""
    cols = set(columns)
    groups: dict[str, dict] = {}

    def add(data_base: str, weight: str) -> None:
        if {f"{data_base}_re", f"{data_base}_im"} <= cols:
            gid = str(len(groups))
            g = {"id": gid, "data": data_base}
            if weight in cols:
                g["weight"] = weight
            if "flag" in cols:
                g["flag"] = "flag"
            groups[gid] = g

    add("data", "data_weight")
    add("corrected_data", "corrected_data_weight")
    add("model_data", "model_data_weight")
    return groups


def resolve_data_group(
    df: DataFrame,
    group: str | int | dict | None = None,
    groups: dict[str, dict] | None = None,
    base: VisSchema = DEFAULT_VIS,
) -> VisSchema:
    """Resolve a group selection into a VisSchema.

    ``group``: a group id (looked up in ``groups``, or in the
    auto-derived registry of ``df``'s columns), or an explicit role
    dict ``{'data': 'corrected_data', 'weight': ..., 'flag': ...}``
    (the reference's ``data_group_in`` literal form). ``None`` → group
    '0'. Roles not named keep ``base``'s columns. Raises KeyError /
    ValueError with the _check_sel_parms contract's messages.
    """
    if isinstance(group, dict):
        g = dict(group)
    else:
        reg = groups if groups is not None \
            else data_groups_from_columns(df.columns)
        gid = "0" if group is None else str(group)
        if gid not in reg:
            raise KeyError(
                f"data_group_in id {gid!r} does not exist in this "
                f"dataset (groups: {sorted(reg)})")
        g = dict(reg[gid])
    data = g.get("data")
    vs = VisSchema(
        time=g.get("time", base.time),
        baseline=g.get("baseline", base.baseline),
        chan=g.get("chan", base.chan),
        pol=g.get("pol", base.pol),
        data_cols=((f"{data}_re", f"{data}_im"),) if data
        else base.data_cols,
        weight=g.get("weight", base.weight),
        flag=g.get("flag", base.flag),
        scan=g.get("scan", base.scan),
        state=g.get("state", base.state),
        field=g.get("field", base.field),
        extra_mean_cols=tuple(g.get("extra_mean_cols",
                                    base.extra_mean_cols)),
        carry_cols=tuple(g.get("carry_cols", base.carry_cols)),
    )
    # validate what the group actually names: data always; weight/flag
    # only when the group binds them (an imaging input may carry no
    # flag column at all — that is not a selection error)
    check = list(vs.flat_data_cols())
    if "weight" in g:
        check.append(vs.weight)
    if "flag" in g:
        check.append(vs.flag)
    missing = [c for c in check if c not in df.columns]
    if missing:
        raise ValueError(
            f"data group selects columns not in the dataset: {missing} "
            f"(have: {sorted(df.columns)})")
    return vs


def write_data_groups(store: str, groups: dict[str, dict]) -> None:
    """Persist the registry as a store sidecar (the xds attrs slot)."""
    with open(os.path.join(store, GROUPS_FILE), "w") as f:
        json.dump({"data_groups": groups}, f, indent=2, sort_keys=True)


def read_data_groups(store: str) -> dict[str, dict] | None:
    p = os.path.join(store, GROUPS_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        doc: Any = json.load(f)
    return doc.get("data_groups")
