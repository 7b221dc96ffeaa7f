from shgvqa_tpu.utils.io import (  # noqa: F401
    load_json,
    save_json,
    load_pickle,
    save_pickle,
    load_json_or_pickle,
)
