from .natural_frequency import TopologyAnalysis, MinFreqOpt  # noqa: F401
