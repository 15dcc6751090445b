from convnets_tpu.tune.sampler import ParameterSampler  # noqa: F401
from convnets_tpu.tune.tuner import Tuner  # noqa: F401
