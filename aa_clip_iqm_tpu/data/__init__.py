from .registry import (  # noqa: F401
    CLASS_NAMES,
    DATA_PATH,
    DATASETS,
    DOMAINS,
    PROMPTS,
    REAL_NAMES,
)
