"""HF tokenizer.json interop, validated against the `tokenizers` Rust
library as an oracle on generated fixtures (byte-level BPE / Metaspace BPE).
"""

import pytest

tokenizers = pytest.importorskip("tokenizers")

from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers  # noqa: E402

from lamp_tpu.data.hf_tokenizer import HFTokenizer  # noqa: E402

CORPUS = ["The quick brown fox jumps over the lazy dog. " * 3,
          "Hello, world! Numbers: 123 456.78 and symbols #@$%",
          "def f(x):\n    return x*2  # comment\n",
          "Unicode: café naïve 東京 ß emoji 🎉 done",
          "It's we're they'll I'd can't"]

TESTS = CORPUS + ["new unseen text?!", "  spaces   and\ttabs\n",
                  "mixed 東京123abc", ""]


@pytest.fixture(scope="module")
def byte_level(tmp_path_factory):
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tr = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<|end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(CORPUS * 20, tr)
    path = str(tmp_path_factory.mktemp("tok") / "byte_level.json")
    tok.save(path)
    return tok, HFTokenizer.from_file(path)


@pytest.fixture(scope="module")
def metaspace(tmp_path_factory):
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    tr = trainers.BpeTrainer(vocab_size=300,
                             special_tokens=["<unk>", "<s>", "</s>"])
    tok.train_from_iterator(CORPUS * 20, tr)
    path = str(tmp_path_factory.mktemp("tok") / "metaspace.json")
    tok.save(path)
    return tok, HFTokenizer.from_file(path)


def test_byte_level_matches_oracle(byte_level):
    oracle, ours = byte_level
    for s in TESTS:
        assert ours.encode(s) == oracle.encode(s).ids, repr(s)
        ids = ours.encode(s)
        assert ours.decode(ids) == oracle.decode(ids), repr(s)


def test_metaspace_matches_oracle(metaspace):
    oracle, ours = metaspace
    for s in TESTS:
        assert ours.encode(s) == oracle.encode(s).ids, repr(s)
        ids = ours.encode(s)
        assert ours.decode(ids) == oracle.decode(ids), repr(s)


def test_special_tokens_split_verbatim(byte_level):
    _, ours = byte_level
    end_id = ours.added["<|end|>"]
    ids = ours.encode("hi <|end|> there")
    assert end_id in ids
    # special token skipped on decode by default
    assert "<|end|>" not in ours.decode(ids)
    assert "<|end|>" in ours.decode(ids, skip_special_tokens=False)


def test_token_bytes_roundtrip(byte_level):
    oracle, ours = byte_level
    tb = ours.token_bytes()
    assert len(tb) == ours.vocab_size
    # concatenating the per-token bytes of an encoding reproduces the text
    s = "Hello, world! 123"
    ids = ours.encode(s)
    assert b"".join(tb[i] for i in ids).decode("utf-8") == s
    # special tokens are empty (forbidden in constrained regions)
    assert tb[ours.added["<|end|>"]] == b""


def test_token_bytes_feed_constrained_decoding(byte_level):
    """A TokenDFA over the BPE vocabulary accepts exactly the token
    sequences whose concatenated bytes match the pattern."""
    from lamp_tpu.models.constrained import TokenDFA

    _, ours = byte_level
    dfa = TokenDFA.compile(r"[0-9]+(\.[0-9]+)?", ours.token_bytes(),
                           eos_token=ours.added["<|end|>"])
    good = ours.encode("123.78")
    assert dfa.match(good)
    assert not dfa.match(ours.encode("12a"))


def test_byte_fallback_metaspace():
    """Llama-style byte fallback: unknown characters emit <0xNN> tokens."""
    vocab = {"<unk>": 0, "▁": 1, "a": 2, "b": 3, "▁ab": 4}
    vocab.update({f"<0x{i:02X}>": 5 + i for i in range(256)})
    spec = {
        "model": {"type": "BPE", "vocab": vocab,
                  "merges": ["▁ a", "▁a b"], "unk_token": "<unk>",
                  "byte_fallback": True},
        "pre_tokenizer": {"type": "Metaspace"},
        "decoder": {"type": "Metaspace"},
        "added_tokens": [{"id": 0, "content": "<unk>", "special": True}],
    }
    ours = HFTokenizer(spec)
    ids = ours.encode("ab é")
    assert ids[0] == vocab["▁ab"]
    # é = 0xC3 0xA9 in utf-8, via byte-fallback tokens
    assert vocab["<0xC3>"] in ids and vocab["<0xA9>"] in ids
    assert ours.decode(ids) == "ab é"


def test_rejects_non_bpe():
    with pytest.raises(ValueError, match="BPE"):
        HFTokenizer({"model": {"type": "Unigram", "vocab": []}})
