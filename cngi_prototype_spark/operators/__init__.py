"""Visibility / image operators (SURVEY.md §2 inventory)."""

from cngi_prototype_spark.operators.flags import (  # noqa: F401
    apply_flags,
    auto_clip,
    manual_flag,
    manual_unflag,
)
from cngi_prototype_spark.operators.averaging import (  # noqa: F401
    chan_average,
    rebin,
    time_average,
)
from cngi_prototype_spark.operators.statistics import (  # noqa: F401
    moments,
    statistics,
    flag_summary,
)
