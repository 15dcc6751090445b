from convnets_tpu.viz.plots import PlotMngr  # noqa: F401
from convnets_tpu.viz.reference_results import (  # noqa: F401
    REFERENCE_RESULTS,
    reference_table,
    merge_measurements,
)
