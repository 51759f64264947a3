"""Config system: YAML defaults-list composition + interpolation + overrides."""

from .loader import load_config, resolve, ConfigError  # noqa: F401
from .schema import panoptic_config_from_yaml  # noqa: F401
