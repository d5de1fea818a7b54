from facekit.train.arcface_head import arc_margin_logits, head_init  # noqa: F401
from facekit.train.step import (  # noqa: F401
    TrainState,
    make_train_step,
    train_state_init,
    train_shardings,
)
