"""Text analysis stages: language-ID, quality scoring, token counts,
document fingerprinting (engine-new; large-scale training-data ops).

All kernels are per-batch and deterministic across processes (no reliance
on PYTHONHASHSEED — hashes are crc32/splitmix based). Regexes are
compiled once per actor (``__init__``), not per batch.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que", "des"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "en", "que", "por", "para"},
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
# BPE-ish token regex in the GPT-2 spirit: word pieces, numbers, punctuation runs
_BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+")
_PUNCT_RE = re.compile(r"[^\w\s]")


def splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def token_hashes(text: str) -> np.ndarray:
    """Deterministic uint64 hash per word token."""
    toks = _WORD_RE.findall(text.lower())
    if not toks:
        return np.empty(0, dtype=np.uint64)
    crcs = np.fromiter((zlib.crc32(t.encode()) for t in toks), dtype=np.uint64, count=len(toks))
    return splitmix64(crcs)


class LangIdStage:
    """Stopword-profile language heuristic; 'und' (undetermined) fallback."""

    def __init__(self):
        self.word = _WORD_RE
        self.profiles = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        langs = []
        for text in batch["text"]:
            words = self.word.findall(str(text).lower())
            if not words:
                langs.append("und")
                continue
            scores = {
                lang: sum(w in sw for w in words) for lang, sw in self.profiles.items()
            }
            best = max(scores, key=lambda k: (scores[k], k))
            langs.append(best if scores[best] > 0 else "und")
        batch["lang_pred"] = langs
        return batch


class QualityStage:
    """Heuristic quality features: lengths, punct/stopword/upper ratios."""

    def __init__(self):
        self.word = _WORD_RE
        self.punct = _PUNCT_RE
        self.stop = frozenset(_LANG_STOPWORDS["en"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_chars, n_words, punct_ratio, stop_ratio, upper_ratio, mean_wlen = (
            [] for _ in range(6)
        )
        for text in batch["text"]:
            s = str(text)
            words = self.word.findall(s.lower())
            nc = len(s)
            n_chars.append(nc)
            n_words.append(len(words))
            punct_ratio.append(len(self.punct.findall(s)) / max(1, nc))
            stop_ratio.append(sum(w in self.stop for w in words) / max(1, len(words)))
            upper_ratio.append(sum(c.isupper() for c in s) / max(1, nc))
            mean_wlen.append(float(np.mean([len(w) for w in words])) if words else 0.0)
        batch["q_n_chars"] = np.array(n_chars, dtype=np.int64)
        batch["q_n_words"] = np.array(n_words, dtype=np.int64)
        batch["q_punct_ratio"] = punct_ratio
        batch["q_stop_ratio"] = stop_ratio
        batch["q_upper_ratio"] = upper_ratio
        batch["q_mean_word_len"] = mean_wlen
        return batch


class TokenCountStage:
    """Whitespace and BPE-ish token counts per document."""

    def __init__(self):
        self.bpe = _BPE_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_ws_tokens"] = [len(str(t).split()) for t in batch["text"]]
        batch["n_bpe_tokens"] = [
            sum(1 for m in self.bpe.finditer(str(t)) if m.group().strip())
            for t in batch["text"]
        ]
        return batch


def rolling_fingerprint(text: str, window: int = 8, keep_mod: int = 16) -> np.ndarray:
    """Winnowing-style document fingerprint: polynomial rolling hash over
    byte windows, keep hashes ≡ 0 (mod keep_mod). Deterministic."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) < window:
        return splitmix64(np.array([zlib.crc32(text.encode())], dtype=np.uint64))
    base = np.uint64(257)
    powers = base ** np.arange(window, dtype=np.uint64)  # wraps mod 2^64
    strided = np.lib.stride_tricks.sliding_window_view(data, window).astype(np.uint64)
    hashes = splitmix64((strided * powers).sum(axis=1, dtype=np.uint64))
    kept = hashes[hashes % np.uint64(keep_mod) == 0]
    return np.unique(kept) if len(kept) else hashes[:1]


class FingerprintStage:
    def __init__(self, window: int = 8, keep_mod: int = 16):
        self.window, self.keep_mod = window, keep_mod

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fingerprint"] = [
            rolling_fingerprint(str(t), self.window, self.keep_mod).astype(np.int64).tolist()
            for t in batch["text"]
        ]
        return batch
