from rtsds_tpu.ops.losses import (  # noqa: F401
    bce_with_logits,
    cross_entropy,
    segmentation_loss,
)
from rtsds_tpu.ops.resize import resize_bilinear, resize_labels_nearest  # noqa: F401
from rtsds_tpu.ops.remap import rgb_to_train_ids  # noqa: F401
from rtsds_tpu.ops.blur import gaussian_blur  # noqa: F401
