import numpy as np
import pytest

from shgvqa_tpu.data.tokenization import (
    BasicTokenizer,
    BertTokenizer,
    WordpieceTokenizer,
    build_vocab_from_corpus,
)
from shgvqa_tpu.data.featurize import encode_questions


def test_basic_tokenizer_lower_punct():
    t = BasicTokenizer()
    assert t.tokenize("Was the PERSON touching-it?") == [
        "was", "the", "person", "touching", "-", "it", "?",
    ]


def test_basic_tokenizer_accents_and_controls():
    t = BasicTokenizer()
    assert t.tokenize("caf\u00e9  na\u00efve") == ["cafe", "naive"]


def test_basic_tokenizer_never_split():
    t = BasicTokenizer()
    # [SEP] as a standalone whitespace token survives un-lowercased and
    # un-split (QAInputArrange packs choices with ' [SEP] ' separators)
    assert t.tokenize("q [SEP] choice") == ["q", "[SEP]", "choice"]


def test_wordpiece_greedy():
    vocab = {"[UNK]": 0, "un": 1, "##aff": 2, "##able": 3, "aff": 4}
    wp = WordpieceTokenizer(vocab)
    assert wp.tokenize("unaffable") == ["un", "##aff", "##able"]
    assert wp.tokenize("zzz") == ["[UNK]"]


def test_build_vocab_and_roundtrip(tmp_path):
    corpus = ["was the person touching the blanket?", "what did they do?"]
    path = tmp_path / "vocab.txt"
    vocab = build_vocab_from_corpus(corpus, path)
    tok = BertTokenizer(path)
    assert len(tok) == len(vocab)
    ids = tok.convert_tokens_to_ids(tok.tokenize("was the person touching"))
    assert all(i != tok.vocab["[UNK]"] for i in ids)
    assert tok.convert_ids_to_tokens(ids) == ["was", "the", "person", "touching"]


def test_encode_questions_shapes_and_padding(tmp_path):
    corpus = ["was the person touching the blanket?"]
    path = tmp_path / "vocab.txt"
    build_vocab_from_corpus(corpus, path)
    tok = BertTokenizer(path)
    out = encode_questions(
        ["was the person touching the blanket?", "was the person"], tok, 12
    )
    assert out["input_ids"].shape == (2, 12)
    # [CLS] at position 0, [SEP] terminates
    assert out["input_ids"][0, 0] == tok.vocab["[CLS]"]
    row1_len = int(out["input_mask"][1].sum())
    assert out["input_ids"][1, row1_len - 1] == tok.vocab["[SEP]"]
    assert out["input_ids"][1, row1_len:].sum() == 0
    assert out["segment_ids"].sum() == 0


def test_encode_questions_truncation(tmp_path):
    corpus = ["a b c d e f g h i j k l m n"]
    path = tmp_path / "vocab.txt"
    build_vocab_from_corpus(corpus, path)
    tok = BertTokenizer(path)
    out = encode_questions(["a b c d e f g h i j k l m n"], tok, 8)
    # truncated to max_seq_length with [CLS]/[SEP] preserved
    assert int(out["input_mask"][0].sum()) == 8
    assert out["input_ids"][0, -1] == tok.vocab["[SEP]"]
