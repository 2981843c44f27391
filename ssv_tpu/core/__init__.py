from .config import load_config, Config
from .experiment import initialize_experiment, seed_everything
