"""GBNF parsing + grammar-constrained decoding (reference: test-grammar-*.cpp)."""

import numpy as np
import pytest

from prima_tpu.grammar import GBNFError, GrammarMatcher, GrammarSampler, parse_gbnf

JSON_GBNF = r"""
root   ::= object
value  ::= object | array | string | number | ("true" | "false" | "null") ws
object ::= "{" ws ( string ":" ws value ("," ws string ":" ws value)* )? "}" ws
array  ::= "[" ws ( value ("," ws value)* )? "]" ws
string ::= "\"" ( [^"\\\x7F\x00-\x1F] | "\\" (["\\bfnrt] | "u" [0-9a-fA-F]{0,4}) )* "\"" ws
number ::= ("-"? ([0-9] | [1-9] [0-9]*)) ("." [0-9]+)? ([eE] [-+]? [0-9]+)? ws
ws     ::= [ \t\n]*
"""

# the reference grammar uses {0,4}; this dialect (b3985-era) lacks bounded
# repetition, so the test grammar uses the * form
JSON_GBNF = JSON_GBNF.replace('[0-9a-fA-F]{0,4}', '[0-9a-fA-F] [0-9a-fA-F] [0-9a-fA-F] [0-9a-fA-F]')


def _accepts(g, text: str) -> bool:
    m = GrammarMatcher(parse_gbnf(g))
    if not m.advance_text(text.encode()):
        return False
    return m.is_complete()


def test_parse_basic():
    g = parse_gbnf('root ::= "yes" | "no"')
    assert len(g.rules[g.root]) == 2


def test_literal_match():
    g = 'root ::= "yes" | "no"'
    assert _accepts(g, "yes")
    assert _accepts(g, "no")
    assert not _accepts(g, "maybe")
    assert not _accepts(g, "ye")  # incomplete


def test_char_class_and_star():
    g = "root ::= [a-z]+ [0-9]*"
    assert _accepts(g, "abc")
    assert _accepts(g, "abc123")
    assert not _accepts(g, "123")
    assert not _accepts(g, "ABC")


def test_optional_and_group():
    g = 'root ::= ("+" | "-")? [0-9]+'
    assert _accepts(g, "42")
    assert _accepts(g, "-42")
    assert _accepts(g, "+7")
    assert not _accepts(g, "--7")


def test_negated_class():
    g = 'root ::= "<" [^>]* ">"'
    assert _accepts(g, "<hello world>")
    assert not _accepts(g, "<a>b>")


def test_rule_refs_and_recursion():
    g = r"""
    root ::= expr
    expr ::= term ([-+] term)*
    term ::= [0-9]+ | "(" expr ")"
    """
    assert _accepts(g, "1+2-3")
    assert _accepts(g, "(1+2)-(3+(4))")
    assert not _accepts(g, "1+")
    assert not _accepts(g, "(1")


def test_json_grammar():
    ok = ['{}', '{"a": 1}', '{"a": [1, 2, {"b": "c"}], "d": null}',
          '{"x": -1.5e+10}', '{"s": "he\\nllo"}']
    bad = ['{', '{"a" 1}', "[1]", '{"a": 01}', '{,}']
    for t in ok:
        assert _accepts(JSON_GBNF, t), t
    for t in bad:
        assert not _accepts(JSON_GBNF, t), t


def test_unicode_in_grammar():
    g = 'root ::= [α-ω]+'
    assert _accepts(g, "αβγ")
    assert not _accepts(g, "abc")


def test_missing_root_raises():
    with pytest.raises(GBNFError):
        parse_gbnf('start ::= "x"')


def test_undefined_rule_raises():
    with pytest.raises(GBNFError):
        parse_gbnf('root ::= missing')


def test_grammar_sampler_masks_and_accepts():
    # toy vocab: each token is a single char
    vocab = [b"y", b"e", b"s", b"n", b"o", b"x", b"</s>"]
    gs = GrammarSampler('root ::= "yes" | "no"', vocab, eog_ids={6})
    logits = np.zeros(7, dtype=np.float32)
    gs.apply(logits)
    assert np.isfinite(logits[0]) and np.isfinite(logits[3])  # y, n
    assert logits[5] == -np.inf  # x
    assert logits[6] == -np.inf  # eog not allowed yet
    gs.accept(0)  # 'y'
    logits = np.zeros(7, dtype=np.float32)
    gs.apply(logits)
    assert np.isfinite(logits[1]) and logits[3] == -np.inf  # only 'e' next
    gs.accept(1)
    gs.accept(2)  # "yes" complete
    logits = np.zeros(7, dtype=np.float32)
    gs.apply(logits)
    assert np.isfinite(logits[6])  # eog now admissible
    assert all(logits[i] == -np.inf for i in range(6))


def test_partial_utf8_feasibility():
    """A token carrying only the first bytes of a multi-byte char must be
    rejected when no completion of those bytes can match the grammar
    (llama_grammar_match_partial_char semantics)."""
    vocab = [b"\xe5\x8b", b"{", b"}", b"\xf0\x80\x81"]
    gs = GrammarSampler('root ::= "{" "}"', vocab)
    assert not gs.accepts(0)  # completes to CJK, grammar wants '{'
    assert not gs.accepts(3)  # overlong/invalid UTF-8 prefix
    assert gs.accepts(1)
    gs.accept(1)
    assert gs.accepts(2)


def test_partial_utf8_feasible_prefix_accepted():
    ch = "é".encode()
    vocab = [ch[:1], ch[1:]]
    gs = GrammarSampler('root ::= [à-ÿ]', vocab)
    assert gs.accepts(0)  # é is a possible completion within [à-ÿ]
    gs.accept(0)
    assert gs.accepts(1)
    gs.accept(1)
    assert gs.matcher.is_complete()


def test_grammar_sampler_multibyte_token_split():
    # a token that is HALF of a UTF-8 character (byte-level BPE does this)
    ch = "é".encode()  # 2 bytes
    vocab = [ch[:1], ch[1:], b"!"]
    gs = GrammarSampler('root ::= "é!"', vocab)
    assert gs.accepts(0)
    gs.accept(0)  # first byte only — partial carry
    assert gs.accepts(1)
    gs.accept(1)
    assert gs.accepts(2)
    gs.accept(2)
    assert gs.matcher.is_complete()


def _matcher(src):
    return GrammarMatcher(parse_gbnf(src))


def test_trailing_symbol_not_optional():
    """Regression: the last symbol of a sequence must be required (an
    end-of-input peek used to be treated as a '?' operator)."""
    m = _matcher('root ::= "a" "b"')
    assert m.advance_text(b"a")
    assert not m.is_complete()
    assert m.advance_text(b"b")
    assert m.is_complete()


def test_postfix_binds_whole_literal():
    """'"ab"+' repeats the full literal, as in the reference parser."""
    m = _matcher('root ::= "ab"+')
    for ch in b"abab":
        assert m.advance_text(bytes([ch]))
    assert m.is_complete()
    m = _matcher('root ::= "ab"+')
    m.advance_text(b"a")
    m.advance_text(b"b")
    m.advance_text(b"a")
    assert not m.is_complete()


def test_braced_repetition():
    """{n}, {m,n}, {m,} (llama-grammar.cpp:444-480)."""
    from prima_tpu.grammar.gbnf import GBNFError, parse_gbnf

    def ok(src, text):
        m = _matcher(src)
        return all(m.advance_text(bytes([c])) for c in text.encode()) \
            and m.is_complete()

    assert ok('root ::= "a"{3}', "aaa")
    assert not ok('root ::= "a"{3}', "aa")
    assert ok('root ::= [0-9]{1,3}', "42")
    assert not ok('root ::= [0-9]{1,3}', "4242")
    assert ok('root ::= "a"{2,}', "aaaa")
    assert not ok('root ::= "a"{2,}', "a")
    assert ok('root ::= ("x" "y"){2} "!"', "xyxy!")
    with pytest.raises(GBNFError):
        parse_gbnf('root ::= "a"{3,2}')


def test_multiline_grammar_and_nested_newlines():
    """The reference's shipped multi-line grammars must parse (newlines are
    plain whitespace after '::=', after '|', and inside groups)."""
    g = parse_gbnf(
        'root ::=\n  "a" (\n  "b" |\n  "c"\n  ) "d"\n'
        'other ::= "x"\n')
    m = GrammarMatcher(g)
    assert m.advance_text(b"abd") and m.is_complete()


def test_utf8_boundary_complete_plus_partial():
    """A token carrying a complete multi-byte char followed by a partial one
    must stay viable (regression: the boundary scan broke at the FIRST lead
    byte in the window)."""
    m = _matcher('root ::= "é€"')
    tok = "é".encode() + "€".encode()[:2]
    assert m.advance_text(tok)
    assert m.advance_text("€".encode()[2:]) and m.is_complete()


def test_left_recursion_clean_error():
    with pytest.raises(GBNFError):
        GrammarMatcher(parse_gbnf('root ::= root "a" | "a"'))
