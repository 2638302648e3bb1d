"""CLIP byte-pair-encoding tokenizer (numpy output, framework-free).

Independent implementation of the OpenAI CLIP BPE scheme over the standard
``bpe_simple_vocab_16e6.txt.gz`` merge table (vocab 49408, context 77,
'<start_of_text>'/'<end_of_text>' specials) with open_clip's truncation rule:
overlong sequences are cut to the context length with EOT forced into the last
slot (reference open_clip/tokenizer.py:246-250).

The reference cleans text with ftfy; ftfy is optional here (mojibake repair is
a no-op for the ASCII prompt templates / class vocabularies this pipeline
feeds), falling back to HTML-unescape + whitespace normalisation.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Iterable, List, Union

import numpy as np

try:
    import regex as _re  # supports \p{L}/\p{N} classes
except ImportError:  # pragma: no cover
    _re = None

try:
    import ftfy as _ftfy
except ImportError:  # pragma: no cover
    _ftfy = None

__all__ = ["SimpleTokenizer", "tokenize", "DEFAULT_CONTEXT_LENGTH"]

DEFAULT_CONTEXT_LENGTH = 77
_BPE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bpe_simple_vocab_16e6.txt.gz")


@functools.lru_cache(maxsize=None)
def bytes_to_unicode():
    """Reversible byte -> printable-unicode mapping (GPT-2 scheme)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    return {(a, b) for a, b in zip(word[:-1], word[1:])}


def _basic_clean(text: str) -> str:
    if _ftfy is not None:
        text = _ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def _whitespace_clean(text: str) -> str:
    import re
    return re.sub(r"\s+", " ", text).strip()


def _canonicalize_text(text: str) -> str:
    """big_vision-style canonicalisation (reference tokenizer.py:104-125):
    lowercase, punctuation stripped, whitespace collapsed."""
    import re
    import string

    text = text.replace("_", " ")
    text = text.translate(str.maketrans("", "", string.punctuation))
    text = text.lower()
    return re.sub(r"\s+", " ", text).strip()


def get_clean_fn(kind: str):
    """(reference tokenizer.py:92-101) 'lower' | 'whitespace' | 'canonicalize'."""
    if kind == "lower":
        return lambda t: _whitespace_clean(_basic_clean(t)).lower()
    if kind == "whitespace":
        return lambda t: _whitespace_clean(_basic_clean(t))
    if kind == "canonicalize":
        return lambda t: _canonicalize_text(_basic_clean(t))
    raise ValueError(f"Invalid clean function '{kind}'")


def random_mask_tokenize(encode_fn, texts, context_length, sot, eot,
                         shuffle=False, rng=None):
    """Randomly drop tokens to fit (reference tokenizer.py:274-300);
    shuffle=False keeps the surviving tokens in order."""
    rng = rng or np.random
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = np.asarray(encode_fn(text), dtype=np.int32)
        if len(tokens) > context_length - 2:
            indices = rng.permutation(len(tokens))[:context_length - 2]
            if not shuffle:
                indices = np.sort(indices)
            tokens = tokens[indices]
        n = len(tokens)
        result[i, 0] = sot
        result[i, 1:n + 1] = tokens
        result[i, n + 1] = eot
    return result


def simple_mask_tokenize(encode_fn, texts, context_length, sot, eot, rng=None):
    """Keep a random contiguous block (reference tokenizer.py:303-324)."""
    rng = rng or np.random
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        tokens = list(encode_fn(text))
        if len(tokens) > context_length - 2:
            num_keep = context_length - 2
            start = int(rng.randint(0, len(tokens) - num_keep + 1))
            tokens = tokens[start:start + num_keep]
        toks = [sot] + tokens + [eot]
        result[i, :len(toks)] = toks
    return result


def syntax_mask_tokenize(encode_fn, texts, context_length, sot, eot):
    """Drop words prioritised by POS tag: nouns > adjectives > verbs > rest
    (reference tokenizer.py:327-380). Needs nltk + its punkt/tagger data."""
    try:
        import nltk
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "syntax reduction masking needs nltk (not available in this "
            "image); use 'simple'/'random'/'shuffle' instead") from e

    def order(tag):
        if tag.startswith("NN"):
            return 1
        if tag.startswith("JJ"):
            return 2
        if tag.startswith("VB"):
            return 3
        return 4

    new_texts = []
    for text in texts:
        words = nltk.tokenize.word_tokenize(text)
        tags = [order(t) for _, t in nltk.pos_tag(words)]
        keep = sorted(np.argsort(np.asarray(tags), kind="stable")[:context_length - 2])
        new_texts.append(" ".join(words[j] for j in keep))

    result = np.zeros((len(new_texts), context_length), dtype=np.int32)
    for i, text in enumerate(new_texts):
        toks = [sot] + list(encode_fn(text)) + [eot]
        if len(toks) > context_length:  # words can emit several BPE tokens
            toks = toks[:context_length]
            toks[-1] = eot
        result[i, :len(toks)] = toks
    return result


def get_reduction_mask_fn(kind: str):
    """Token-dropping strategy registry (reference tokenizer.py:383-394)."""
    if kind == "simple":
        return simple_mask_tokenize
    if kind == "random":
        return random_mask_tokenize
    if kind == "shuffle":
        return functools.partial(random_mask_tokenize, shuffle=True)
    if kind == "syntax":
        return syntax_mask_tokenize
    raise ValueError(f"Invalid reduction mask '{kind}' "
                     "(known: simple, random, shuffle, syntax)")


class SimpleTokenizer:
    def __init__(self, bpe_path: str = _BPE_PATH,
                 context_length: int = DEFAULT_CONTEXT_LENGTH,
                 clean: str = "lower", reduction_mask: str = ""):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = merges[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        special_tokens = ["<start_of_text>", "<end_of_text>"]
        vocab.extend(special_tokens)
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self._cache = {t: t for t in special_tokens}
        if _re is not None:
            self.pat = _re.compile(
                "|".join(special_tokens)
                + r"""|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
                _re.IGNORECASE,
            )
        else:  # ASCII-equivalent fallback
            import re
            self.pat = re.compile(
                "|".join(special_tokens)
                + r"""|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
                re.IGNORECASE,
            )
        self.vocab_size = len(self.encoder)
        self.sot_token_id = self.encoder["<start_of_text>"]
        self.eot_token_id = self.encoder["<end_of_text>"]
        self.context_length = context_length
        self.clean_fn = get_clean_fn(clean)
        self.reduction_fn = (get_reduction_mask_fn(reduction_mask)
                             if reduction_mask else None)

    def bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda pair: self.bpe_ranks.get(pair, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        result = " ".join(word)
        self._cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        tokens: List[int] = []
        text = self.clean_fn(text)
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return tokens

    def decode(self, tokens: Iterable[int]) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return (bytearray(self.byte_decoder[c] for c in text)
                .decode("utf-8", errors="replace").replace("</w>", " "))

    def __call__(self, texts: Union[str, List[str]],
                 context_length: int | None = None) -> np.ndarray:
        """Tokenize to an int32 array [n_texts, context_length] (0-padded)."""
        if isinstance(texts, str):
            texts = [texts]
        context_length = context_length or self.context_length
        if self.reduction_fn is not None:
            return self.reduction_fn(self.encode, texts, context_length,
                                     self.sot_token_id, self.eot_token_id)
        result = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            toks = [self.sot_token_id] + self.encode(text) + [self.eot_token_id]
            if len(toks) > context_length:
                toks = toks[:context_length]
                toks[-1] = self.eot_token_id
            result[i, :len(toks)] = toks
        return result


@functools.lru_cache(maxsize=1)
def _default_tokenizer() -> SimpleTokenizer:
    return SimpleTokenizer()


def tokenize(texts: Union[str, List[str]],
             context_length: int = DEFAULT_CONTEXT_LENGTH) -> np.ndarray:
    """Module-level convenience mirroring ``open_clip.tokenizer.tokenize``."""
    return _default_tokenizer()(texts, context_length)
