"""Small IO helpers.

Counterpart of the reference's ``AGQA/src/utils.py:20-35``.  One quirk the
reference relies on: several of its ``data/*.json`` artifacts are actually
*pickle* files despite the extension (loaded via ``load_pickle`` at
``agqa_data.py:111,119``).  ``load_json_or_pickle`` sniffs the format so our
datasets accept either encoding.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any


def load_json(path: str | Path) -> Any:
    with open(path, "r") as f:
        return json.load(f)


def save_json(data: Any, path: str | Path, **kwargs: Any) -> None:
    with open(path, "w") as f:
        json.dump(data, f, **kwargs)


def load_pickle(path: str | Path) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(data: Any, path: str | Path) -> None:
    with open(path, "wb") as f:
        pickle.dump(data, f)


def load_json_or_pickle(path: str | Path) -> Any:
    """Load a file that may be JSON text or a pickle with a .json name."""
    with open(path, "rb") as f:
        head = f.read(64)
    # JSON files start with whitespace/typical JSON punctuation in ASCII.
    try:
        head_text = head.decode("utf-8")
    except UnicodeDecodeError:
        return load_pickle(path)
    if head_text.lstrip()[:1] in ("{", "[", '"') or head_text.lstrip()[:1].isdigit():
        try:
            return load_json(path)
        except (json.JSONDecodeError, UnicodeDecodeError):
            return load_pickle(path)
    return load_pickle(path)
