from rtsds_tpu.train.state import TrainState, create_train_state  # noqa: F401
from rtsds_tpu.train.optim import make_optimizer  # noqa: F401
from rtsds_tpu.train.supervised import make_train_step  # noqa: F401
from rtsds_tpu.train.adversarial import make_adversarial_step  # noqa: F401
