from rtsds_tpu.utils.metrics import (  # noqa: F401
    confusion_matrix,
    fast_hist,
    per_class_iou,
    mean_iou,
    pixel_accuracy,
)
from rtsds_tpu.utils.schedules import poly_lr_schedule  # noqa: F401
from rtsds_tpu.utils.seeding import set_seed  # noqa: F401
from rtsds_tpu.utils.tabular import tabular_print  # noqa: F401
