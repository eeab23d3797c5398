from .losses import bp_criterion, eval_criterion, scm_loss
from .samplers import BucketSampler, CurriculumSampler
from .schedules import anneal_fn, cyclical_fn, lr_schedule, scalar_schedule
from .scm_driver import (
    TrainState,
    dp_replicate_state,
    evaluate_epoch,
    make_eval_step,
    make_optimizer,
    make_train_step,
    train_epoch,
)
