from .checkpoint import (  # noqa: F401
    load_loss_history,
    maybe_resume,
    restore_checkpoint,
    save_checkpoint,
    shape_filtered_restore,
    wait_for_checkpoints,
)
from .loop import (  # noqa: F401
    donation_supported,
    fit_epoch,
    make_eval_apply,
    make_eval_step,
    make_train_step,
)
from .objectives import OBJECTIVES  # noqa: F401
from .state import TrainState, create_train_state, make_optimizer  # noqa: F401
