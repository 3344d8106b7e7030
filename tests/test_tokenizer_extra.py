"""WPM (BERT), UGM (T5) and RWKV tokenizers — behavior tests against
hand-built vocabularies mirroring the reference's semantics."""

import numpy as np
import pytest

from prima_tpu.tokenizer import Tokenizer
from prima_tpu.tokenizer.ugm import RWKV, UGM, rwkv_unescape
from prima_tpu.tokenizer.vocab import TokenType, Vocab
from prima_tpu.tokenizer.wpm import wpm_encode, wpm_preprocess

N, U, C = TokenType.NORMAL, TokenType.USER_DEFINED, TokenType.CONTROL


def _vocab(model, tokens, scores=None, types=None, **kw):
    n = len(tokens)
    return Vocab(model=model, pre="default", tokens=tokens,
                 scores=scores or [0.0] * n,
                 token_types=types or [int(N)] * n, **kw)


# ---------------------------------------------------------------------------
# WPM
# ---------------------------------------------------------------------------


def _bert_vocab():
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "▁hello", "▁wor", "ld",
            "▁hi", "▁.", "▁,"]
    types = [int(C), int(TokenType.UNKNOWN), int(C), int(C)] + [int(N)] * 6
    return _vocab("bert", toks, types=types, unk_id=1, cls_id=2, sep_id=3)


def test_wpm_preprocess_splits_and_lowercases():
    assert wpm_preprocess("Hello, World") == ["hello", ",", "world"]
    assert wpm_preprocess("a  b") == ["a", "b"]
    # CJK characters become single-char words
    assert wpm_preprocess("abc中文x") == ["abc", "中", "文", "x"]


def test_wpm_greedy_longest_match():
    v = _bert_vocab()
    assert wpm_encode(v, "Hello world") == [4, 5, 6]
    assert wpm_encode(v, "hello, world") == [4, 9, 5, 6]


def test_wpm_unknown_word_collapses():
    v = _bert_vocab()
    assert wpm_encode(v, "hello xyz") == [4, 1]


def test_wpm_cls_sep_wrapping():
    tok = Tokenizer(_bert_vocab())
    assert tok.encode("hello world", add_special=True) == [2, 4, 5, 6, 3]
    assert tok.encode("hello world", add_special=False) == [4, 5, 6]
    assert "hello" in tok.decode([4, 5, 6])


# ---------------------------------------------------------------------------
# UGM
# ---------------------------------------------------------------------------


def _t5_vocab():
    toks = ["<unk>", "▁", "▁he", "▁hello", "llo", "l", "o", "▁world",
            "<x>", "▁wor", "ld"]
    scores = [0.0, -2.0, -4.0, -5.0, -4.0, -1.5, -1.5, -6.0, 0.0, -5.0, -5.0]
    types = [int(TokenType.UNKNOWN)] + [int(N)] * 7 + [int(U), int(N), int(N)]
    return _vocab("t5", toks, scores=scores, types=types, unk_id=0,
                  add_space_prefix=True, remove_extra_whitespaces=True)


def test_ugm_viterbi_picks_best_score():
    ugm = UGM(_t5_vocab())
    # "▁hello" (-5) beats "▁he"+"llo" (-8) and "▁"+... chains
    assert ugm.encode("hello") == [3]
    # "▁world" (-6) beats "▁wor"+"ld" (-10)
    assert ugm.encode("hello world") == [3, 7]


def test_ugm_user_defined_scores_zero():
    ugm = UGM(_t5_vocab())
    # the user-defined <x> costs 0, so it always wins where it matches
    out = ugm.encode("hello<x>hello")
    assert 8 in out
    i = out.index(8)
    assert out[:i] == [3]


def test_ugm_unknown_merging():
    ugm = UGM(_t5_vocab())
    out = ugm.encode("hello éé hello")  # é not in vocab
    unks = [t for t in out if t == 0]
    assert len(unks) == 1  # consecutive unknowns merged


def test_ugm_whitespace_normalization():
    ugm = UGM(_t5_vocab())
    # remove_extra_whitespaces collapses runs; add_space_prefix prepends
    assert ugm.encode("hello   world") == ugm.encode("hello world")


# ---------------------------------------------------------------------------
# RWKV
# ---------------------------------------------------------------------------


def test_rwkv_unescape():
    assert rwkv_unescape("ab") == b"ab"
    assert rwkv_unescape("\\x41\\x42") == b"AB"
    assert rwkv_unescape("a\\nb\\tc") == b"a\nb\tc"
    assert rwkv_unescape("\\\\") == b"\\"


def test_rwkv_greedy_longest_match():
    toks = ["<unk>", "a", "b", "ab", "abc", "\\x20"]
    v = _vocab("rwkv", toks, unk_id=0)
    rw = RWKV(v)
    assert rw.encode("abc") == [4]
    assert rw.encode("ab a") == [3, 5, 1]
    assert rw.encode("abd") == [3, 0]  # d unknown
    assert rw.decode_token(5) == b" "


def test_rwkv_tokenizer_facade():
    toks = ["<unk>", "hel", "lo", "hello"]
    tok = Tokenizer(_vocab("rwkv", toks, unk_id=0))
    assert tok.encode("hello", add_special=False) == [3]
    assert tok.decode([1, 2]) == "hello"
