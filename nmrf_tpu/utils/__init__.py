from .logger import log_every_n_seconds, setup_logger
from .misc import (
    MetricLogger,
    SmoothedValue,
    check_path,
    collect_env_info,
    get_sha,
    seed_all_rng,
)
