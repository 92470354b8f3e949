"""HuggingFace ``tokenizer.json`` interop: a self-contained BPE codec.

Completes the HF checkpoint interop story (models/hf.py imports Llama-family
WEIGHTS; this imports the matching tokenizer) and feeds
:mod:`lamp_tpu.models.constrained` with real vocabularies via
:meth:`HFTokenizer.token_bytes`.

Counterpart of the reference's tokenizer layer (reference
lamp-data/src/main/scala/lamp/data/bytesegmentencoding/package.scala and
Codec.scala) — but where the reference ships only its own byte-segment BPE,
production vocabularies come as HF ``tokenizer.json``. This is a pure-Python
parser/encoder for the two dominant families:

- **byte-level BPE** (GPT-2/RoBERTa/GPT-NeoX): ByteLevel pre-tokenizer with
  the GPT-2 split regex, bytes mapped through the GPT-2 byte<->unicode
  table, rank-greedy pair merging.
- **Metaspace BPE** (Llama-1/2, Mistral sentencepiece exports): whitespace
  replaced by U+2581, optional prefix space, byte fallback tokens
  ``<0xNN>``.

``tests/test_hf_tokenizer.py`` validates both against the ``tokenizers``
Rust library as an oracle on generated tokenizer.json files.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

__all__ = ["HFTokenizer"]

_METASPACE = "▁"


def _gpt2_byte_encoder() -> Dict[int, str]:
    """The GPT-2 byte -> unicode printable-char table."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_BYTE_ENC = _gpt2_byte_encoder()
_BYTE_DEC = {c: b for b, c in _BYTE_ENC.items()}

# GPT-2 pre-tokenization pattern (contractions, letter runs, number runs,
# punctuation runs, trailing/other whitespace)
_GPT2_SPLIT = (r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"
               r" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+")


class HFTokenizer:
    """Parses a HF ``tokenizer.json`` (BPE models) and provides
    ``encode`` / ``decode`` / ``token_bytes``.

    Special/added tokens are matched verbatim before pre-tokenization (the
    HF "added vocabulary" behavior). Unknown characters fall back to the
    model's ``unk_token`` (or byte-fallback tokens when present).
    """

    def __init__(self, spec: dict):
        model = spec.get("model", {})
        if model.get("type") != "BPE":
            raise ValueError(
                f"only BPE tokenizer.json supported, got {model.get('type')}"
            )
        self.vocab: Dict[str, int] = dict(model["vocab"])
        merges = model.get("merges", [])
        self.ranks: Dict[Tuple[str, str], int] = {}
        for i, m in enumerate(merges):
            pair = tuple(m.split(" ", 1)) if isinstance(m, str) else tuple(m)
            self.ranks[pair] = i
        self.unk_token: Optional[str] = model.get("unk_token")
        self.byte_fallback = bool(model.get("byte_fallback", False))
        self.fuse_unk = bool(model.get("fuse_unk", False))

        self.added: Dict[str, int] = {}
        self.special: set = set()
        for tok in spec.get("added_tokens", []) or []:
            self.added[tok["content"]] = tok["id"]
            if tok.get("special"):
                self.special.add(tok["content"])
            self.vocab.setdefault(tok["content"], tok["id"])

        self.id_to_token: Dict[int, str] = {}
        for t, i in self.vocab.items():
            self.id_to_token[i] = t

        # pre-tokenizer / decoder family detection
        self.mode = "none"
        self.add_prefix_space = False
        self.metaspace_prepend = True
        for pt in self._flatten(spec.get("pre_tokenizer")):
            t = pt.get("type")
            if t == "ByteLevel":
                self.mode = "byte_level"
                self.add_prefix_space = bool(pt.get("add_prefix_space",
                                                    False))
            elif t == "Metaspace":
                self.mode = "metaspace"
                scheme = pt.get("prepend_scheme",
                                "always" if pt.get("add_prefix_space", True)
                                else "never")
                self.metaspace_prepend = scheme != "never"
        if self.mode == "none":
            for dc in self._flatten(spec.get("decoder")):
                if dc.get("type") == "ByteLevel":
                    self.mode = "byte_level"
                elif dc.get("type") == "Metaspace":
                    self.mode = "metaspace"

        import regex

        self._split = regex.compile(_GPT2_SPLIT)

    @staticmethod
    def _flatten(node) -> List[dict]:
        if not node:
            return []
        if node.get("type") == "Sequence":
            out = []
            for sub in (node.get("pretokenizers")
                        or node.get("decoders") or []):
                out.extend(HFTokenizer._flatten(sub))
            return out
        return [node]

    @classmethod
    def from_file(cls, path: str) -> "HFTokenizer":
        with open(path, "r", encoding="utf-8") as f:
            return cls(json.load(f))

    # -- encoding -----------------------------------------------------------

    def _bpe(self, symbols: List[str]) -> List[str]:
        """Rank-greedy merge loop (the BPE algorithm)."""
        if len(symbols) < 2:
            return symbols
        while True:
            best_rank = None
            best_i = -1
            for i in range(len(symbols) - 1):
                r = self.ranks.get((symbols[i], symbols[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                return symbols
            symbols = (symbols[:best_i]
                       + [symbols[best_i] + symbols[best_i + 1]]
                       + symbols[best_i + 2:])

    def _word_ids(self, word: str) -> List[int]:
        toks = self._bpe(list(word))
        out: List[int] = []
        for t in toks:
            i = self.vocab.get(t)
            if i is not None:
                out.append(i)
                continue
            # unmergeable symbol: byte fallback, then unk
            handled = False
            if self.byte_fallback:
                bts = t.encode("utf-8")
                ids = [self.vocab.get(f"<0x{b:02X}>") for b in bts]
                if all(j is not None for j in ids):
                    out.extend(ids)
                    handled = True
            if not handled and self.unk_token is not None:
                u = self.vocab[self.unk_token]
                if not (self.fuse_unk and out and out[-1] == u):
                    out.append(u)
        return out

    def encode(self, text: str) -> List[int]:
        # split out added/special tokens first (verbatim match)
        segments: List[Tuple[str, bool]] = [(text, False)]
        for tok in sorted(self.added, key=len, reverse=True):
            nxt: List[Tuple[str, bool]] = []
            for seg, is_tok in segments:
                if is_tok:
                    nxt.append((seg, True))
                    continue
                parts = seg.split(tok)
                for j, p in enumerate(parts):
                    if j:
                        nxt.append((tok, True))
                    if p:
                        nxt.append((p, False))
            segments = nxt

        ids: List[int] = []
        for seg, is_tok in segments:
            if is_tok:
                ids.append(self.added[seg])
            elif self.mode == "byte_level":
                s = " " + seg if self.add_prefix_space else seg
                for m in self._split.findall(s):
                    word = "".join(_BYTE_ENC[b] for b in m.encode("utf-8"))
                    ids.extend(self._word_ids(word))
            elif self.mode == "metaspace":
                s = seg.replace(" ", _METASPACE)
                if self.metaspace_prepend and not s.startswith(_METASPACE):
                    s = _METASPACE + s
                ids.extend(self._word_ids(s))
            else:
                ids.extend(self._word_ids(seg))
        return ids

    # -- decoding -----------------------------------------------------------

    def _token_raw_bytes(self, tok: str) -> bytes:
        """The byte contribution of one (non-added) token: byte-level map,
        byte-fallback <0xNN>, or the utf-8 of the metaspace-restored text.
        Assembling BYTES (not str) lets multi-token utf-8 sequences from
        byte-fallback reassemble correctly."""
        if self.mode == "byte_level":
            return bytes(_BYTE_DEC.get(c, ord(" ")) for c in tok)
        if self.byte_fallback and len(tok) == 6 and tok.startswith("<0x") \
                and tok.endswith(">"):
            return bytes([int(tok[3:5], 16)])
        return tok.replace(_METASPACE, " ").encode("utf-8")

    def decode(self, ids: Sequence[int], *,
               skip_special_tokens: bool = True) -> str:
        out = bytearray()
        added_ids = set(self.added.values())
        for i in ids:
            tok = self.id_to_token.get(int(i))
            if tok is None:
                continue
            if skip_special_tokens and tok in self.special:
                continue
            if int(i) in added_ids and tok not in self.special:
                out += tok.encode("utf-8")
            else:
                out += self._token_raw_bytes(tok)
        text = out.decode("utf-8", errors="replace")
        if self.mode == "metaspace" and self.metaspace_prepend \
                and text.startswith(" "):
            text = text[1:]
        return text

    # -- constrained-decoding bridge ---------------------------------------

    def token_bytes(self) -> List[bytes]:
        """Byte string of every vocab id, for
        :meth:`lamp_tpu.models.constrained.TokenDFA.compile`. Special/added
        tokens map to b'' (forbidden inside a constrained region — pass the
        EOS id via ``eos_token`` instead)."""
        n = max(self.id_to_token) + 1
        out = [b""] * n
        for i, tok in self.id_to_token.items():
            if tok in self.special:
                continue
            out[i] = self._token_raw_bytes(tok)
        return out

    @property
    def vocab_size(self) -> int:
        return max(self.id_to_token) + 1
