"""Complex arithmetic over paired (re, im) double columns.

Reference parity: complex128 DATA cubes and the scalar complex math used
throughout (abs: ``cngi/vis/visplot.py:61-62``, ``ngcasa/flagging/
auto_clip.py:45-46``; phasor multiply: ``ngcasa/imaging/direction_rotate
.py:215-247``). Spark has no complex dtype; expressions over a pair of
DoubleType columns stay inside whole-stage codegen — no UDF cost.

Every helper takes/returns Column pairs so the expressions compose and
Catalyst folds them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnPair = tuple[Column, Column]


def c_abs(re: Column, im: Column) -> Column:
    """|z| = sqrt(re^2 + im^2)."""
    return F.sqrt(re * re + im * im)


def c_add(a: ColumnPair, b: ColumnPair) -> ColumnPair:
    return (a[0] + b[0], a[1] + b[1])


def c_sub(a: ColumnPair, b: ColumnPair) -> ColumnPair:
    return (a[0] - b[0], a[1] - b[1])


def c_mul(a: ColumnPair, b: ColumnPair) -> ColumnPair:
    """(a.re + i a.im)(b.re + i b.im)."""
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def c_conj(a: ColumnPair) -> ColumnPair:
    return (a[0], -a[1])


def c_scale(a: ColumnPair, s: Column) -> ColumnPair:
    return (a[0] * s, a[1] * s)


def c_phasor(phase: Column) -> ColumnPair:
    """exp(i*phase) = (cos(phase), sin(phase)).

    Reference: ``direction_rotate.py:215-247`` multiplies DATA by
    exp(2*pi*i * phase_shift).
    """
    return (F.cos(phase), F.sin(phase))


def c_div(a: ColumnPair, b: ColumnPair) -> ColumnPair:
    """a / b = a * conj(b) / |b|^2."""
    denom = b[0] * b[0] + b[1] * b[1]
    num = c_mul(a, c_conj(b))
    return (num[0] / denom, num[1] / denom)
