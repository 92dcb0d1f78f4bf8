from rtsds_tpu.eval.validate import make_eval_step, validate  # noqa: F401
