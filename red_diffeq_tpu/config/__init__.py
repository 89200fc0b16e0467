from red_diffeq_tpu.config.default_config import get_config, get_marmousi_config
from red_diffeq_tpu.config.config_utils import (
    load_config, save_config, update_config, print_config,
)

__all__ = [
    'get_config', 'get_marmousi_config',
    'load_config', 'save_config', 'update_config', 'print_config',
]
