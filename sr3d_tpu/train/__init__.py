"""Training layer: joint SR+MICA model, trainer loop, checkpointing."""

from .joint import (  # noqa: F401
    JointModules,
    JointTrainState,
    build_joint,
    init_train_state,
    make_train_step,
    make_val_step,
)
