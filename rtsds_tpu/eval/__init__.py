from rtsds_tpu.eval.ensemble import (  # noqa: F401
    make_ensemble_eval_step,
    make_ensemble_predict,
)
from rtsds_tpu.eval.sliding import make_sliding_predict  # noqa: F401
from rtsds_tpu.eval.validate import make_eval_step, validate  # noqa: F401
