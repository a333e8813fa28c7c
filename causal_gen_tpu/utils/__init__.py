from causal_gen_tpu.utils.ema import ema_decay, ema_update
from causal_gen_tpu.utils.normalization import (
    MORPHOMNIST_MIN_MAX,
    UKBB_ATTR_MAX_MIN,
    get_attr_max_min,
    log_standardize,
    normalize,
    unnormalize,
)
from causal_gen_tpu.utils.schedules import beta_anneal, linear_warmup

__all__ = [
    "ema_decay",
    "ema_update",
    "beta_anneal",
    "linear_warmup",
    "normalize",
    "unnormalize",
    "log_standardize",
    "get_attr_max_min",
    "UKBB_ATTR_MAX_MIN",
    "MORPHOMNIST_MIN_MAX",
]
