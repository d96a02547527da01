from .config_utils import load_config
from .logging_utils import setup_logging
