"""Long-form visibility data model.

Reference parity: the xds 4-D cube ``(time, baseline, chan, pol)`` with
data variables DATA/CORRECTED_DATA/FLAG/WEIGHT/UVW/... (SURVEY.md §1;
``/root/reference/cngi/conversion/convert_ms.py:127-204``). Here one xds
partition is one DataFrame with one row per (time, baseline, chan, pol)
sample; complex values are paired double columns ``*_re``/``*_im``;
missing cube cells are **absent rows** (the reference NaN-pads —
``cngi/_utils/_table_conversion.py:311-318`` — which its operators then
have to nan-skip everywhere; sparse long form makes that discipline
automatic via SQL NULL semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class VisSchema:
    """Column-role descriptor for a long-form visibility DataFrame.

    Plays the role of the xds dimension/coordinate/data-variable split
    (docs/data_structures.ipynb md 21): ``keys`` are the cube dimensions,
    ``data``-like pairs are complex data variables, the rest are
    per-sample scalars.
    """

    time: str = "time"
    baseline: str = "baseline"
    chan: str = "chan"
    pol: str = "pol"
    # complex data variables: name -> (re, im) column pair
    data_cols: tuple[tuple[str, str], ...] = (("data_re", "data_im"),)
    weight: str = "data_weight"
    flag: str = "flag"
    # grouping scalars expanded per (time, baseline) in the reference
    scan: str = "scan_number"
    state: str = "state_id"
    field: str = "field_id"
    extra_mean_cols: tuple[str, ...] = ()  # averaged plainly (uvw, exposure...)
    carry_cols: tuple[str, ...] = ()  # carried through group-by via first()

    @property
    def keys(self) -> tuple[str, str, str, str]:
        return (self.time, self.baseline, self.chan, self.pol)

    def flat_data_cols(self) -> tuple[str, ...]:
        return tuple(c for pair in self.data_cols for c in pair)


DEFAULT_VIS = VisSchema()
