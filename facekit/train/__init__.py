from facekit.train.arcface_head import (  # noqa: F401
    arc_margin_logits,
    combined_margin_logits,
    head_init,
)
from facekit.train.step import (  # noqa: F401
    TrainState,
    make_optimizer,
    make_train_step,
    train_state_init,
    train_shardings,
)
