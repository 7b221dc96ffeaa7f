"""AGQA hypergraph-QA driver (reference: ``src/tasks/agqaHGQA.py``).

Accepts the reference flags; --taskHGQA is implied if no task flag given."""

from __future__ import annotations

import sys

from shgvqa_tpu.cli.common import run_driver


def main(argv=None) -> dict:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not any(a.startswith("--task") for a in argv):
        argv.append("--taskHGQA")
    return run_driver("agqa", argv)


if __name__ == "__main__":
    main()
