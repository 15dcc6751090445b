from convnets_tpu.viz.plots import PlotMngr  # noqa: F401
