"""YAML config round-trip utilities (reference: red_diffeq/config/config_utils.py:6-53)."""
from pathlib import Path
from typing import Union

import ml_collections
import yaml


def load_config(config_path: Union[str, Path]) -> ml_collections.ConfigDict:
    config_path = Path(config_path)
    if not config_path.exists():
        raise FileNotFoundError(f'Config file not found: {config_path}')
    with open(config_path, 'r') as f:
        raw = yaml.safe_load(f)
    return ml_collections.ConfigDict(raw or {})


def _tuples_to_lists(obj):
    if isinstance(obj, dict):
        return {k: _tuples_to_lists(v) for k, v in obj.items()}
    if isinstance(obj, (tuple, list)):
        return [_tuples_to_lists(v) for v in obj]
    return obj


def save_config(config: ml_collections.ConfigDict, output_path: Union[str, Path]) -> None:
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with open(output_path, 'w') as f:
        yaml.dump(_tuples_to_lists(config.to_dict()), f,
                  default_flow_style=False, sort_keys=False)


def update_config(config: ml_collections.ConfigDict, **kwargs) -> ml_collections.ConfigDict:
    for key, value in kwargs.items():
        if not hasattr(config, key):
            print(f"Warning: '{key}' not in config, adding it")
        setattr(config, key, value)
    return config


def print_config(config: ml_collections.ConfigDict, prefix: str = '') -> None:
    if not prefix:
        print('=' * 60)
        print('Configuration:')
        print('=' * 60)
    for key, value in sorted(config.items()):
        if isinstance(value, ml_collections.ConfigDict):
            print(f'{prefix}{key}:')
            print_config(value, prefix=prefix + '  ')
        else:
            print(f'{prefix}{key}: {value}')
    if not prefix:
        print('=' * 60)
