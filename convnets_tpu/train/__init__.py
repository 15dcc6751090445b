from convnets_tpu.train.engine import Trainer  # noqa: F401
from convnets_tpu.train.state import TrainState, create_train_state  # noqa: F401
from convnets_tpu.train.scheduler import ReduceLROnPlateau, StepDecay  # noqa: F401
from convnets_tpu.train import optim, metrics, checkpoint  # noqa: F401
