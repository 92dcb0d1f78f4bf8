from rtsds_tpu.callbacks.base import Callback  # noqa: F401
from rtsds_tpu.callbacks.checkpoint import EarlyStopping, ModelCheckpoint  # noqa: F401
from rtsds_tpu.callbacks.history import HistoryCallback, read_history  # noqa: F401
from rtsds_tpu.callbacks.logging import TensorBoardCallback, WandBCallback  # noqa: F401
from rtsds_tpu.callbacks.plots import ImagePlotsCallback  # noqa: F401
