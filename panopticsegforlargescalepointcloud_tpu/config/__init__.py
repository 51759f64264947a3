"""Config system: YAML defaults-list composition + interpolation + overrides."""

from .loader import ConfigError, explicit_overrides, load_config, resolve  # noqa: F401
from .schema import panoptic_config_from_yaml  # noqa: F401
