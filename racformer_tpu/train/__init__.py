from .matching import hungarian_assign, match_cost
from .losses import (
    sigmoid_focal_loss,
    categorical_focal_loss,
    depth_loss,
    detection_loss,
)
from .optim import make_optimizer, cosine_warmup_schedule
from .step import TrainState, make_train_step
