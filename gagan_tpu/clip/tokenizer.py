"""CLIP byte-pair-encoding tokenizer.

Standard CLIP BPE (as used by the reference via the `clip` package's
`clip.tokenize`, `SimilarDomains/trainers.py:272-276`).  The public vocab
file `bpe_simple_vocab_16e6.txt.gz` is located via GAGAN_CLIP_BPE or the
local HuggingFace cache (transformers ships the same merge table for
openai/clip-vit-*).

Without any vocab file the tokenizer degrades to a deterministic BYTE-LEVEL
fallback: CLIP's vocab places the 512 byte tokens (256 raw + 256 `</w>`
word-final) at ids 0..511 and `<|startoftext|>`/`<|endoftext|>` at
49406/49407, so encoding with zero merges still produces valid CLIP token
ids — just longer, unmerged sequences.  Like the random metric towers, this
is tagged loudly (`is_byte_fallback`, stderr warning): embeddings are
consistent but NOT equal to real-CLIP tokenization.
"""

from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from typing import List, Union

import numpy as np


@lru_cache()
def bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text):
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text):
    import re

    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    def __init__(self, bpe_path: str = None):
        import re

        bpe_path = bpe_path or os.environ.get("GAGAN_CLIP_BPE", "")
        self.is_byte_fallback = not (bpe_path and os.path.isfile(bpe_path))
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        if self.is_byte_fallback:
            import sys

            print("[gagan_tpu.clip] WARNING: no BPE vocab "
                  "(set GAGAN_CLIP_BPE to bpe_simple_vocab_16e6.txt.gz); "
                  "using the byte-level fallback tokenizer — token ids are "
                  "valid CLIP ids but sequences are unmerged, embeddings "
                  "differ from real-CLIP tokenization", file=sys.stderr)
            merges = []
        else:
            merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
            merges = merges[1: 49152 - 256 - 2 + 1]
            merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        if self.is_byte_fallback:
            # Pin the special tokens at their real-CLIP ids (49406/49407 =
            # 512 byte tokens + 48894 merges) so converted text towers index
            # the right embedding rows.
            self.encoder["<|startoftext|>"] = 49406
            self.encoder["<|endoftext|>"] = 49407
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        if _has_regex():
            import regex

            self.pat = regex.compile(
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
                r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+", regex.IGNORECASE)
        else:
            # ASCII fallback (stdlib re lacks \p classes); identical for
            # English prompts.
            self.pat = re.compile(
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
                r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+", re.IGNORECASE)

    def bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1e10))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        word = " ".join(word)
        self.cache[token] = word
        return word

    def encode(self, text: str) -> List[int]:
        bpe_tokens = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t]
                              for t in self.bpe(token).split(" "))
        return bpe_tokens


def _has_regex() -> bool:
    try:
        import regex  # noqa: F401

        return True
    except ImportError:
        return False


def tokenize(texts: Union[str, List[str]], tokenizer: SimpleTokenizer,
             context_length: int = 77) -> np.ndarray:
    """clip.tokenize equivalent: [N, context_length] int32 token ids."""
    if isinstance(texts, str):
        texts = [texts]
    sot = tokenizer.encoder["<|startoftext|>"]
    eot = tokenizer.encoder["<|endoftext|>"]
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = [sot] + tokenizer.encode(text) + [eot]
        if len(tokens) > context_length:
            tokens = tokens[:context_length - 1] + [eot]
        result[i, : len(tokens)] = tokens
    return result
