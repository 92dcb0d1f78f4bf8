from rtsds_tpu.train.accumulate import (  # noqa: F401
    make_accumulating_train_step,
    split_microbatches,
)
from rtsds_tpu.train.adversarial import make_adversarial_step  # noqa: F401
from rtsds_tpu.train.distill import (  # noqa: F401
    distillation_kl,
    load_teacher_variables,
    make_distill_step,
)
from rtsds_tpu.train.ema import ema_init, ema_update  # noqa: F401
from rtsds_tpu.train.optim import make_optimizer  # noqa: F401
from rtsds_tpu.train.qat import (  # noqa: F401
    create_qat_state,
    export_int8,
    prepare_qat,
    writeback,
)
from rtsds_tpu.train.self_training import (  # noqa: F401
    calibrate_class_thresholds,
    make_self_training_step,
    pseudo_labels,
)
from rtsds_tpu.train.state import TrainState, create_train_state  # noqa: F401
from rtsds_tpu.train.supervised import make_train_step  # noqa: F401
