from .checkpoint import Checkpointer, load_params_npz, save_params_npz
from .loop import TrainState, fit, make_eval_step, make_train_step
from .losses import CORE_LOSS_KEY, LossConfig, compute_loss
from .optimizer import make_optimizer
