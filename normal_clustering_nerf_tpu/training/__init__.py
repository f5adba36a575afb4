from .state import TrainState, create_train_state  # noqa: F401
from .trainer import Trainer  # noqa: F401
