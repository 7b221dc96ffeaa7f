from shgvqa_tpu.configs.config import (  # noqa: F401
    Config,
    EncoderConfig,
    DecoderConfig,
    DataConfig,
    OptimConfig,
    MeshConfig,
)
from shgvqa_tpu.configs.cli import parse_reference_flags  # noqa: F401
