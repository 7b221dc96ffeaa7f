"""WordPiece tokenizer parity against TWO independent oracles.

1. The reference's own tokenizer (``/root/reference/AGQA/src/lxrt/
   tokenization.py`` -- the pytorch-pretrained-bert implementation the
   published recipes use, imported read-only at runtime).
2. ``transformers.BertTokenizer`` (the canonical maintained implementation),
   constructed from the same local vocab file.

The real bert-base-uncased vocab cannot be downloaded in this environment
(zero egress; fetch recipe in tools/fetch_bert_vocab.py), so the tests use a
crafted WordPiece vocab that exercises every tokenizer code path: subword
continuations, punctuation splitting, accent stripping, CJK isolation,
never-split specials inside QA-packed strings, OOV words, and the >100-char
word guard.  Identical output on these inputs + the same greedy
longest-match algorithm means identical output on the real vocab.
"""

import os
import sys

import pytest

REF = "/root/reference/AGQA"

VOCAB_TOKENS = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    # whole words
    "the", "person", "what", "did", "do", "before", "after", "was",
    "holding", "table", "cup", "open", "close", "door", "a", "to",
    # subword pieces
    "un", "##aff", "##able", "##ing", "##s", "##ful", "play", "##ed",
    "watch", "tele", "##vision", "##vis", "##ion", "snack", "##ed",
    # single chars + continuations (wordpiece fallback granularity)
    "c", "##o", "##k", "##e", "d", "##r", "##i", "##n",
    # punctuation
    "?", ",", ".", ":", "'", "-", "/",
    # digits as tokens (QA packing uses '0:' .. '3:')
    "0", "1", "2", "3", "4",
    # accented-source words (post-strip forms)
    "cafe", "naive",
    # CJK single chars (BERT isolates them); ASCII escapes per repo policy
    "\u4eba", "\u95e8",
]

SENTENCES = [
    "What did the person do before holding the cup?",
    "what   did\tthe person\ndo?",                      # whitespace soup
    "The person OPENED the door, didn't they?",          # case + apostrophe
    "Watch television?",                                  # subword splits
    "unaffable playing watched",                          # multi-piece words
    "caf\u00e9 na\u00efve",                               # accent stripping
    "coke drink",                                         # char-level pieces
    "zzzzqqqq unknownword",                               # OOV -> [UNK]
    "\u4eba\u95e8 door",                                  # CJK isolation
    "a" * 150,                                            # >100 chars -> UNK
    "open/close the-door 0: cup 1: table",               # punct + digits
    # QA-packed strings as produced by qa_prep (data_transforms.py:137-165):
    "What did they do? [SEP] 0: open the door [SEP] 1: close the door "
    "[SEP] 2: watch television [SEP] 3: play",
    "",                                                   # empty
    "   ",                                                # whitespace only
    "control\x00char\ufffdhere",                          # stripped chars
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    path.write_text("\n".join(VOCAB_TOKENS) + "\n", encoding="utf-8")
    return str(path)


@pytest.fixture(scope="module")
def ours(vocab_file):
    from shgvqa_tpu.data.tokenization import BertTokenizer
    return BertTokenizer(vocab_file)


@pytest.fixture(scope="module")
def ref_tok(vocab_file):
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # stub download-path deps the reference imports unconditionally
    # (requests is genuinely installed -- only boto3/botocore are missing)
    import types
    sys.modules.setdefault("boto3", types.ModuleType("boto3"))
    if "botocore" not in sys.modules:
        botocore = types.ModuleType("botocore")
        exceptions = types.ModuleType("botocore.exceptions")
        exceptions.ClientError = type("ClientError", (Exception,), {})
        botocore.exceptions = exceptions
        sys.modules["botocore"] = botocore
        sys.modules["botocore.exceptions"] = exceptions
    from src.lxrt.tokenization import BertTokenizer as RefBertTokenizer
    return RefBertTokenizer(vocab_file)


@pytest.fixture(scope="module")
def hf_tok(vocab_file):
    # other parity tests stub requests/timm/boto3 (bare ModuleTypes with
    # __spec__=None) for the reference's download paths; transformers'
    # import machinery probes these and chokes on the stubs -- evict them
    # (requests is genuinely installed; timm is genuinely absent)
    for root in ("requests", "timm", "boto3", "torchvision"):
        mod = sys.modules.get(root)
        if mod is not None and getattr(mod, "__file__", None) is None:
            for name in [m for m in sys.modules
                         if m == root or m.startswith(root + ".")]:
                del sys.modules[name]
    transformers = pytest.importorskip("transformers")
    return transformers.BertTokenizer(
        vocab_file=vocab_file, do_lower_case=True, do_basic_tokenize=True)


@pytest.mark.parametrize("i", range(len(SENTENCES)))
def test_tokens_match_reference(ours, ref_tok, i):
    s = SENTENCES[i]
    ours_toks = ours.tokenize(s)
    ref_toks = ref_tok.tokenize(s)
    assert ours_toks == ref_toks, f"sentence {s!r}"
    assert (ours.convert_tokens_to_ids(ours_toks)
            == ref_tok.convert_tokens_to_ids(ref_toks))


@pytest.mark.parametrize("i", range(len(SENTENCES)))
def test_tokens_match_transformers(ours, hf_tok, i):
    s = SENTENCES[i]
    assert ours.tokenize(s) == hf_tok.tokenize(s), f"sentence {s!r}"


def test_vocab_ids_match_reference(ours, ref_tok):
    assert dict(ref_tok.vocab) == dict(ours.vocab)


def test_sentence_featurizer_ids_match_reference(ours, ref_tok):
    """convert_sents_to_features parity (entry.py:28-73): [CLS] q [SEP],
    pad to max_seq_length, ids/mask/segments."""
    from shgvqa_tpu.data import featurize

    sents = SENTENCES[:13]
    enc = featurize.encode_questions(sents, ours, max_seq_length=20)
    for i, s in enumerate(sents):
        toks = ref_tok.tokenize(s.strip())[:18]
        ref_ids = ref_tok.convert_tokens_to_ids(["[CLS]"] + toks + ["[SEP]"])
        n = len(ref_ids)
        assert list(enc["input_ids"][i][:n]) == ref_ids
        assert all(enc["input_ids"][i][n:] == 0)
        assert list(enc["input_mask"][i]) == [1] * n + [0] * (20 - n)
        assert all(enc["segment_ids"][i] == 0)


def test_fetch_bert_vocab_validator(tmp_path):
    """tools/fetch_bert_vocab.py accepts only a structurally genuine
    bert-base-uncased vocab (30522 tokens, canonical special-token ids)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import fetch_bert_vocab as fbv

    tokens = ["[PAD]"] + [f"[unused{i}]" for i in range(99)] + [
        "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    tokens += [f"tok{i}" for i in range(len(tokens), fbv.EXPECTED_TOKENS)]
    tokens[1996] = "the"
    good = tmp_path / "vocab.txt"
    good.write_text("\n".join(tokens) + "\n", encoding="utf-8")
    sha = fbv.validate(str(good))
    assert len(sha) == 64

    dest = tmp_path / "installed.txt"
    assert fbv.main([str(good), "--dest", str(dest)]) == 0
    assert dest.read_text() == good.read_text()

    bad = tmp_path / "bad.txt"
    bad.write_text("\n".join(tokens[:-1]) + "\n", encoding="utf-8")
    with pytest.raises(SystemExit):
        fbv.validate(str(bad))
