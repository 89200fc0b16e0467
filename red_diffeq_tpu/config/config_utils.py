"""Config (de)serialization and override helpers.

Capability parity with reference red_diffeq/config/config_utils.py:6-53
(YAML load/save, flat kwarg overrides, pretty-printing), re-expressed:
save converts tuples to lists so YAML round-trips cleanly, and the
printer renders nested sections with indentation.
"""
import warnings
from pathlib import Path
from typing import Union

import ml_collections
import yaml

PathLike = Union[str, Path]


def load_config(config_path: PathLike) -> ml_collections.ConfigDict:
    """Read a YAML file into a ConfigDict (missing file raises)."""
    path = Path(config_path)
    if not path.is_file():
        raise FileNotFoundError(f'no such config file: {path}')
    raw = yaml.safe_load(path.read_text())
    return ml_collections.ConfigDict(raw or {})


def _yaml_safe(obj):
    """Recursively map tuples to lists so yaml.dump emits plain sequences."""
    if isinstance(obj, dict):
        return {k: _yaml_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_yaml_safe(v) for v in obj]
    return obj


def save_config(config: ml_collections.ConfigDict,
                output_path: PathLike) -> None:
    """Snapshot a ConfigDict as YAML, creating parent directories."""
    path = Path(output_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    text = yaml.dump(_yaml_safe(config.to_dict()),
                     default_flow_style=False, sort_keys=False)
    path.write_text(text)


def update_config(config: ml_collections.ConfigDict,
                  **kwargs) -> ml_collections.ConfigDict:
    """Apply flat key=value overrides in place; unknown keys are added
    with a warning rather than rejected."""
    for key, value in kwargs.items():
        if not hasattr(config, key):
            warnings.warn(f'config has no field {key!r}; adding it',
                          stacklevel=2)
        setattr(config, key, value)
    return config


def print_config(config: ml_collections.ConfigDict, prefix: str = '') -> None:
    """Render the config tree to stdout, one indented key per line."""
    top_level = not prefix
    if top_level:
        bar = '-' * 60
        print(f'{bar}\nconfig\n{bar}')
    for key in sorted(config.keys()):
        value = config[key]
        if isinstance(value, ml_collections.ConfigDict):
            print(f'{prefix}{key}:')
            print_config(value, prefix=prefix + '  ')
        else:
            print(f'{prefix}{key}: {value}')
    if top_level:
        print('-' * 60)
