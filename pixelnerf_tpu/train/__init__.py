from .loss import alpha_loss_nv2, make_render_loss, rgb_loss, rgb_loss_with_uncertainty  # noqa: F401
from .state import (  # noqa: F401
    TrainState,
    export_torch_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from .step import make_eval_step, make_train_step  # noqa: F401
from .trainer import Trainer  # noqa: F401
