from medical_image_classification_tpu.train.train_state import (
    TrainState,
    init_train_state,
    make_train_step,
    make_train_step_fn,
    make_eval_step,
    kan_grid_update,
    cross_entropy_loss,
)
from medical_image_classification_tpu.train.optim import (
    make_optimizer,
    make_schedule,
    no_weight_decay_mask,
)
from medical_image_classification_tpu.train.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    save_params_only,
    load_params_only,
)
from medical_image_classification_tpu.train.fusion_losses import (
    fusion_loss,
    ssim,
    msssim,
    sobel_grad,
)
