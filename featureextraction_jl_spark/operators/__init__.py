"""Temporal / windowed / training-data operators (SURVEY.md §2 Groups C + extras)."""

from featureextraction_jl_spark.operators.asof import asof_join  # noqa: F401
from featureextraction_jl_spark.operators.sessionize import sessionize  # noqa: F401
from featureextraction_jl_spark.operators.backfill import forward_fill, backward_fill  # noqa: F401
from featureextraction_jl_spark.operators.windows import (  # noqa: F401
    with_lag_lead,
    rolling_rows,
    rolling_time,
    tumbling,
)
from featureextraction_jl_spark.operators.dedup import latest_row  # noqa: F401
from featureextraction_jl_spark.operators.ann import (  # noqa: F401
    assign_cells,
    ivf_topk,
    ivf_topk_batch,
    train_ivf_centroids,
)
