from recommendflow_tpu.train.trainer import (
    TrainState, Trainer, current_learning_rate, make_optimizer, set_learning_rate,
)
from recommendflow_tpu.train.callbacks import (
    Callback, EarlyStopping, EvalCallback, History, ModelCheckpoint, ReduceLROnPlateau,
)
from recommendflow_tpu.train.monitor import PromotionBlocked, model_online_monitor
from recommendflow_tpu.train.optimizers import (
    make_lr_schedule, make_partitioned_optimizer, rowwise_adagrad,
)
from recommendflow_tpu.train.freq import freq_init, freq_update, log_q
