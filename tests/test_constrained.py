"""Constrained (grammar-guided) decoding: regex->DFA compiler, token-table
lifting, and serving integration (masked sampling + automaton advance).

Beyond-parity serving feature — the reference has no serving layer
(SURVEY.md §1); its only inference-time sampling is global-temperature
multinomial (lamp-data/.../languagemodel/package.scala:93-106).
"""

import json
import re

import jax
import numpy as np
import pytest

import lamp_tpu.nn as nn
from lamp_tpu.models.constrained import (RegexError, TokenDFA, byte_vocab,
                                         json_value_regex)
from lamp_tpu.models.sampling import SamplingParams


# ---------------------------------------------------------------------------
# regex -> byte DFA
# ---------------------------------------------------------------------------

CASES = [
    (r"abc", ["abc", "ab", "abcd", ""]),
    (r"a*b+c?", ["b", "aaabbc", "c", "ab", "abc", ""]),
    (r"(foo|bar)+", ["foo", "barfoo", "ba", "foobarbaz", "foobar"]),
    (r"[a-f0-9]{2,4}", ["a1", "abcd", "a", "abcde", "g1"]),
    (r"-?[0-9]+(\.[0-9]+)?", ["-12", "3.14", "12.", ".5", "7"]),
    (r"[^x]*x", ["aaax", "x", "xx", "abc"]),
    (r"\d{3}-\d{4}", ["555-1234", "55-1234", "5551234"]),
    (r"a.c", ["abc", "a.c", "ac", "a\nc"]),
    (r"\w+@\w+(\.\w+)+", ["a@b.co", "a@b", "x_1@y.z.w"]),
]


@pytest.mark.parametrize("pattern,strings", CASES)
def test_regex_dfa_matches_re(pattern, strings):
    dfa = TokenDFA.compile(pattern, byte_vocab())
    for s in strings:
        got = dfa.match(list(s.encode()))
        want = re.fullmatch(pattern, s) is not None
        assert got == want, (pattern, s)


def test_regex_dfa_fuzz():
    rng = np.random.default_rng(0)
    alphabet = "abcde01._z"
    for pattern in [r"(a|bb)*c[de]{1,3}", r"[a-z_][a-z0-9_]*",
                    r"(0|1)+(\.(0|1)+)?"]:
        dfa = TokenDFA.compile(pattern, byte_vocab())
        for _ in range(300):
            n = int(rng.integers(0, 9))
            s = "".join(alphabet[i] for i in rng.integers(0, len(alphabet), n))
            got = dfa.match(list(s.encode()))
            want = re.fullmatch(pattern, s) is not None
            assert got == want, (pattern, s)


def test_regex_errors():
    for bad in ["(ab", "a[b", "a{2", "*a", "a|)", "a{3,1}", "x\\"]:
        with pytest.raises(RegexError):
            TokenDFA.compile(bad, byte_vocab())


def test_multibyte_token_lift():
    """BPE-style vocabulary: tokens spanning several bytes advance the DFA
    through every byte; a token crossing into a forbidden byte is masked."""
    vocab = [b"a", b"b", b"ab", b"ba", b"abab", b"", b"x"]
    dfa = TokenDFA.compile(r"(ab)+", vocab, eos_token=5)
    assert dfa.match([2])            # "ab"
    assert dfa.match([0, 1])         # "a"+"b"
    assert dfa.match([4])            # "abab"
    assert dfa.match([2, 0, 1])      # "ab"+"a"+"b"
    assert not dfa.match([3])        # "ba"
    assert not dfa.match([0])        # "a" alone isn't accepting
    # from the start state "b"/"ba"/"x" are forbidden; empty token always is
    row = dfa.table[dfa.start]
    assert row[0] >= 0 and row[2] >= 0 and row[4] >= 0
    assert row[1] < 0 and row[3] < 0 and row[6] < 0
    # eos (index 5) allowed only in accepting states, as a self-loop
    assert row[5] < 0
    s_after_ab = int(dfa.table[dfa.start, 2])
    assert dfa.accepting[s_after_ab]
    assert int(dfa.table[s_after_ab, 5]) == s_after_ab


def test_json_value_regex():
    dfa = TokenDFA.compile(json_value_regex(max_depth=3), byte_vocab())
    good = ['{"a": [1, 2, {"b": null}]}', '[true, false, "x\\n"]', "3.5e-2",
            '"hi"', "{ }", "[[[1]]]", "-0.5", "null"]
    bad = ["{a: 1}", "[1,]", "01", "tru", '"\\q"', "[[[[1]]]]", "+1", ""]
    for s in good:
        assert dfa.match(list(s.encode())), s
    for s in bad:
        assert not dfa.match(list(s.encode())), s


def test_json_object_root():
    dfa = TokenDFA.compile(json_value_regex(max_depth=2, root="object"),
                           byte_vocab())
    assert dfa.match(list(b'{"k": 1}'))
    assert not dfa.match(list(b"1"))


# ---------------------------------------------------------------------------
# serving integration
# ---------------------------------------------------------------------------


def _server(**kw):
    from lamp_tpu.models.serving import ModernBatchServer

    model = nn.ModernLM.init(vocab_size=256, context_length=128, num_blocks=2,
                             embed_dim=32, num_heads=4, num_kv_heads=2,
                             key=jax.random.PRNGKey(0))
    return ModernBatchServer(model, page_size=8, total_pages=64, **kw)


EOS = 0
PHONE = r"[0-9]{3}-[0-9]{4}"


def test_serving_constrained_step():
    srv = _server()
    dfa = TokenDFA.compile(PHONE, byte_vocab(), eos_token=EOS)
    srv.register_constraint("phone", dfa)
    srv.add("a", [104, 105], constraint="phone")
    srv.add("b", [104, 105])  # unconstrained rider in the same batch
    toks = [srv.step()["a"] for _ in range(10)]
    assert re.fullmatch(PHONE.encode(), bytes(toks[:8]))
    # after the full match only EOS remains legal (self-loop)
    assert toks[8:] == [EOS, EOS]


def test_serving_constrained_step_many_matches_step():
    dfa = TokenDFA.compile(PHONE, byte_vocab(), eos_token=EOS)
    s1 = _server()
    s1.register_constraint("phone", dfa)
    s1.add("a", [104, 105], constraint="phone")
    expected = [s1.step()["a"] for _ in range(10)]
    s2 = _server()
    s2.register_constraint("phone", dfa)
    s2.add("a", [104, 105], constraint="phone")
    s2.add("b", [7, 9])
    out = s2.step_many(10)
    assert out["a"] == expected


def test_serving_constraint_validation():
    srv = _server()
    with pytest.raises(ValueError, match="unknown constraint"):
        srv.add("a", [1, 2], constraint="nope")
    srv.register_constraint("p", TokenDFA.compile(PHONE, byte_vocab(),
                                                  eos_token=EOS))
    with pytest.raises(ValueError, match="duplicate"):
        srv.register_constraint(
            "p", TokenDFA.compile(PHONE, byte_vocab()))
    with pytest.raises(ValueError, match="vocab"):
        srv.register_constraint(
            "q", TokenDFA.compile(PHONE, byte_vocab(128)))


def test_engine_json_mode():
    from lamp_tpu.models.serving import ServingEngine

    jdfa = TokenDFA.compile(json_value_regex(max_depth=2), byte_vocab(),
                            eos_token=EOS)
    for seed in (3, 7):
        srv = _server(seed=seed)
        srv.register_constraint("json", jdfa)
        eng = ServingEngine(srv, decode_steps=4)
        eng.submit([104], SamplingParams(temperature=1.0, max_tokens=40,
                                         stop_tokens=(EOS,)),
                   request_id="j", constraint="json")
        res = eng.run()
        body = bytes(t for t in res["j"] if t != EOS)
        if len(res["j"]) < 40:  # EOS-stopped => complete match => parses
            json.loads(body)


def test_engine_rejects_unknown_constraint():
    from lamp_tpu.models.serving import ServingEngine

    eng = ServingEngine(_server())
    with pytest.raises(ValueError, match="unknown constraint"):
        eng.submit([1, 2], constraint="nope")
