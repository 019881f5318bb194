from .trainer import (  # noqa: F401
    TrainState,
    ctc_loss_fn,
    ctc_train_step,
    make_train_step,
    shard_batch,
)
