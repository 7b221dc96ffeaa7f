from shgvqa_tpu.evalsuite.agqa import AGQAEvaluator, AGQA_ALL_QTYPES_NAMES  # noqa: F401
from shgvqa_tpu.evalsuite.star import STAREvaluator  # noqa: F401
