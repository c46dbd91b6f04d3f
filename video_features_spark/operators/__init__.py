from .asof import asof_join  # noqa: F401
from .windows import (  # noqa: F401
    backfill,
    lag_lead,
    resample,
    sessionize,
    sliding_stacks,
    top_k,
    tumbling_window_agg,
)
