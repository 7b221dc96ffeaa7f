"""STAR driver (reference: ``src/tasks/star.py``): --taskHGQA / --taskVQA /
--taskHGVQA over the 4-way multiple-choice STAR benchmark."""

from __future__ import annotations

import sys

from shgvqa_tpu.cli.common import run_driver


def main(argv=None) -> dict:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not any(a.startswith("--task") for a in argv):
        argv.append("--taskHGQA")
    return run_driver("star", argv)


if __name__ == "__main__":
    main()
