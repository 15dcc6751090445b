from convnets_tpu.core.precision import Policy, DEFAULT_POLICY, MIXED_POLICY, policy_from_setting  # noqa: F401
from convnets_tpu.core.rng import set_reproducible_mode, RngStream  # noqa: F401
from convnets_tpu.core import shapes  # noqa: F401
