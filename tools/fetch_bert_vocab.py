#!/usr/bin/env python
"""Install the real bert-base-uncased WordPiece vocab for accuracy parity.

The reference downloads this vocab at tokenizer construction
(``lxrt/tokenization.py:136`` -> ``file_utils.cached_path``, URL in
``PRETRAINED_VOCAB_ARCHIVE_MAP``).  This build environment has zero network
egress, so the fetch is documented instead of automatic:

On a machine with network access, run ONE of:

    curl -L -o vocab.txt \\
      https://huggingface.co/bert-base-uncased/resolve/main/vocab.txt
    # or the original S3 mirror the reference uses:
    curl -L -o vocab.txt https://s3.amazonaws.com/models.huggingface.co/\\
bert/bert-base-uncased-vocab.txt

then copy it next to the dataset annotations and point the CLI at it:

    python -m shgvqa_tpu.cli.star ... --vocab /path/to/vocab.txt

or place it at ``{dataDir}/vocab.txt`` (the default lookup in
``cli/common.py:build_tokenizer``).

This script validates + installs a locally provided copy:

    python tools/fetch_bert_vocab.py /path/to/vocab.txt [--dest data/vocab.txt]
"""

from __future__ import annotations

import argparse
import hashlib
import shutil
import sys

# Structural facts about the genuine bert-base-uncased vocab (stable across
# every mirror): 30522 lines; [PAD]=0, [unused0]=1, [UNK]=100, [CLS]=101,
# [SEP]=102, [MASK]=103, "the"=1996.
EXPECTED_TOKENS = 30522
EXPECTED_IDS = {
    "[PAD]": 0,
    "[unused0]": 1,
    "[UNK]": 100,
    "[CLS]": 101,
    "[SEP]": 102,
    "[MASK]": 103,
    "the": 1996,
}


def validate(path: str) -> str:
    with open(path, "rb") as f:
        blob = f.read()
    sha = hashlib.sha256(blob).hexdigest()
    lines = blob.decode("utf-8").splitlines()
    vocab = {tok: i for i, tok in enumerate(lines)}
    problems = []
    if len(lines) != EXPECTED_TOKENS:
        problems.append(f"expected {EXPECTED_TOKENS} tokens, got {len(lines)}")
    for tok, idx in EXPECTED_IDS.items():
        if vocab.get(tok) != idx:
            problems.append(f"{tok!r} at {vocab.get(tok)}, expected {idx}")
    if problems:
        raise SystemExit(
            "NOT the bert-base-uncased vocab:\n  " + "\n  ".join(problems))
    return sha


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src", help="path to a downloaded vocab.txt")
    ap.add_argument("--dest", default="data/vocab.txt")
    args = ap.parse_args(argv)

    sha = validate(args.src)
    shutil.copyfile(args.src, args.dest)
    print(f"installed {args.src} -> {args.dest}")
    print(f"sha256 {sha}")
    print(f"tokens {EXPECTED_TOKENS}  ([CLS]=101 [SEP]=102 [MASK]=103)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
