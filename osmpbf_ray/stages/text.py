"""Text analysis stages: language-ID, quality scoring, token counts,
document fingerprinting (engine-new; large-scale training-data ops).

All kernels are per-batch and deterministic across processes (no reliance
on PYTHONHASHSEED — hashes are crc32/splitmix based). The hot stages
(lang-ID, quality, token counts) are pyarrow.compute-vectorized: one RE2
split / count / is_in kernel call per BATCH plus numpy bincount segment
reductions — no Python loop over rows. Word tokens are maximal ASCII
``[a-z]+`` runs of the lowercased text, the SAME definition the DuckDB
oracles use (``regexp_extract_all(lower(text), '[a-z]+')``), so engine
and oracle tokenize identically by construction.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Tokenization is intentionally ASCII-only (maximal [a-z]+ runs, matching
# the oracle SQL), so every stopword here must itself be an ASCII token —
# accented words like "für" would split ("f","r") and never match.
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "den", "von"},
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


def _text_col(batch: pa.Table) -> pa.ChunkedArray:
    col = batch.column("text")
    if not pa.types.is_string(col.type):
        col = col.cast(pa.string())
    return pc.fill_null(col, "")


def _word_segments(texts) -> tuple[pa.Array, np.ndarray]:
    """(flat tokens, parent row index) for the maximal-[a-z]+-run tokens
    of the lowercased text — ONE RE2 split over the whole batch; empty
    split fragments (leading/trailing/adjacent separators) ride along and
    are masked by callers."""
    lists = pc.split_pattern_regex(pc.utf8_lower(texts), "[^a-z]+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    return flat, parents


def _stopword_counts(flat: pa.Array, parents: np.ndarray, n: int,
                     value_set: pa.Array) -> np.ndarray:
    # value_set is a PREBUILT pa.Array (hoisted to stage __init__ — one
    # Arrow array per actor, not one per batch)
    mask = pc.is_in(flat, value_set=value_set).to_numpy(zero_copy_only=False)
    return np.bincount(parents[mask], minlength=n)


class LangIdStage:
    """Stopword-profile language heuristic; 'und' (undetermined) fallback.

    Ties break to the lexicographically LARGEST language code (the
    original ``max(scores, key=(score, lang))`` contract, reproduced in
    the lang_id oracle's CASE ladder)."""

    # descending lexicographic order => np.argmax's first-max wins ties
    _LANGS = ("fr", "es", "en", "de")

    def __init__(self):
        self.profiles = [pa.array(sorted(_LANG_STOPWORDS[lang]))
                         for lang in self._LANGS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("lang_pred", pa.array([], type=pa.string()))
        flat, parents = _word_segments(_text_col(batch))
        scores = np.stack(
            [_stopword_counts(flat, parents, n, sw) for sw in self.profiles]
        )
        best = scores.argmax(axis=0)
        langs = np.array(self._LANGS, dtype=object)[best]
        langs[scores.max(axis=0) == 0] = "und"
        return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


class QualityStage:
    """Heuristic quality features: lengths, punct/stopword/upper ratios.

    All ASCII-word-token based (see module docstring); the punct count
    uses the same RE2 ``[^\w\s]`` class the quality_score oracle runs.
    """

    def __init__(self):
        self.stop = pa.array(sorted(_LANG_STOPWORDS["en"]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        texts = _text_col(batch)
        if n == 0:
            for name, typ in (("q_n_chars", pa.int64()), ("q_n_words", pa.int64()),
                              ("q_punct_ratio", pa.float64()),
                              ("q_stop_ratio", pa.float64()),
                              ("q_upper_ratio", pa.float64()),
                              ("q_mean_word_len", pa.float64())):
                batch = batch.append_column(name, pa.array([], type=typ))
            return batch
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        flat, parents = _word_segments(texts)
        wlens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = np.bincount(parents[wlens > 0], minlength=n)
        wlen_sum = np.bincount(parents, weights=wlens.astype(np.float64), minlength=n)
        punct = pc.count_substring_regex(texts, pattern=r"[^\w\s]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        upper = pc.count_substring_regex(texts, pattern=r"\p{Lu}").to_numpy(
            zero_copy_only=False).astype(np.int64)
        stop = _stopword_counts(flat, parents, n, self.stop)
        return (
            batch.append_column("q_n_chars", pa.array(n_chars))
            .append_column("q_n_words", pa.array(n_words.astype(np.int64)))
            .append_column("q_punct_ratio", pa.array(punct / np.maximum(1, n_chars)))
            .append_column("q_stop_ratio", pa.array(stop / np.maximum(1, n_words)))
            .append_column("q_upper_ratio", pa.array(upper / np.maximum(1, n_chars)))
            .append_column("q_mean_word_len", pa.array(
                np.where(n_words > 0, wlen_sum / np.maximum(1, n_words), 0.0)))
        )


# the BPE-ish alternation minus its whitespace branches: every surviving
# match strips non-empty, so counting matches of THIS pattern equals the
# old "matches whose .strip() is truthy" Python loop (RE2 has no
# lookahead, so the original \s+(?!\S) branch cannot run there; its
# matches were whitespace-only and never counted anyway)
_BPE_COUNT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\d+| ?[^\s\w]+"


class TokenCountStage:
    """Whitespace and BPE-ish token counts per document — two RE2
    count_substring_regex calls per batch, no per-row Python."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = _text_col(batch)
        n_ws = pc.count_substring_regex(texts, pattern=r"\S+")
        n_bpe = pc.count_substring_regex(texts, pattern=_BPE_COUNT_PATTERN)
        return batch.append_column(
            "n_ws_tokens", n_ws.cast(pa.int64())
        ).append_column("n_bpe_tokens", n_bpe.cast(pa.int64()))


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


def batch_rolling_fingerprints(texts, window: int = 8, keep_mod: int = 16,
                               base: int = 257
                               ) -> tuple[np.ndarray, np.ndarray]:
    """Exploded ``(parent_row_index, fingerprint)`` for every text in the
    batch — bit-equal to :func:`rolling_fingerprint` per row, but ONE
    ``sliding_window_view`` over the batch's concatenated UTF-8 buffer
    (window indices are selected per doc via a segmented arange, so
    cross-document windows never contribute). Python touches only the
    rare sub-``window``-byte docs (crc fallback). Within each doc, kept
    hashes come out unique-ascending, matching ``np.unique``.

    ``keep_mod=1`` keeps EVERY window hash (uniqued per doc) — with a
    custom ``base`` this is also the batch kernel for k-char shingle
    sets (dedup.char_shingle_hashes uses the FNV prime base)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not pa.types.is_string(texts.type):
        texts = texts.cast(pa.string())
    texts = pc.fill_null(texts, "")
    n = len(texts)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    off = np.frombuffer(texts.buffers()[1], dtype=np.int32)
    off = off[texts.offset: texts.offset + n + 1].astype(np.int64)
    dbuf = texts.buffers()[2]
    data = (np.frombuffer(dbuf, dtype=np.uint8) if dbuf is not None
            else np.empty(0, np.uint8))
    # memory bound: the window hash materializes a (bytes × window)
    # uint64 intermediate — 64× the text at window 8. A default Ray
    # block can hold ~128 MiB of text, which would blow up to GBs in
    # one shot; process contiguous DOC RANGES of ≤ ~1 MiB instead (the
    # per-chunk intermediate stays ~64 MiB; single oversized docs still
    # process whole — a document is the atomic unit).
    _CHUNK = 1 << 20
    if n > 1 and off[-1] - off[0] > _CHUNK:
        parts_p: list[np.ndarray] = []
        parts_h: list[np.ndarray] = []
        start = 0
        while start < n:
            end = start + 1
            while end < n and off[end + 1] - off[start] <= _CHUNK:
                end += 1
            cp, ch = batch_rolling_fingerprints(
                texts.slice(start, end - start), window, keep_mod, base)
            parts_p.append(cp + start)
            parts_h.append(ch)
            start = end
        return np.concatenate(parts_p), np.concatenate(parts_h)
    lens = np.diff(off)
    nwin = np.maximum(lens - window + 1, 0)
    long_mask = lens >= window
    parts_p: list[np.ndarray] = []
    parts_h: list[np.ndarray] = []
    if long_mask.any():
        powers = np.uint64(base) ** np.arange(window, dtype=np.uint64)  # wraps mod 2^64
        # window ONLY this call's byte span: an Arrow slice SHARES the
        # parent's full data buffer, so windowing `data` whole would
        # re-materialize and re-hash the entire parent block once per
        # chunk (the chunk loop above would be O(B²) and unbounded in
        # memory instead of the cap it exists to provide)
        lo = int(off[0])
        span = data[lo:int(off[-1])]
        strided = np.lib.stride_tricks.sliding_window_view(
            span, window).astype(np.uint64)
        all_h = splitmix64((strided * powers).sum(axis=1, dtype=np.uint64))
        total = int(nwin.sum())
        par = np.repeat(np.arange(n, dtype=np.int64), nwin)
        seg_off = np.repeat(np.r_[0, np.cumsum(nwin)[:-1]], nwin)
        gidx = (np.arange(total, dtype=np.int64) - seg_off
                + np.repeat(off[:-1] - lo, nwin))
        h = all_h[gidx]
        keep = h % np.uint64(keep_mod) == 0
        kp, kh = par[keep], h[keep]
        if len(kp):
            order = np.lexsort((kh, kp))
            kp, kh = kp[order], kh[order]
            uniq = np.r_[True, (kp[1:] != kp[:-1]) | (kh[1:] != kh[:-1])]
            kp, kh = kp[uniq], kh[uniq]
        has_kept = np.zeros(n, dtype=bool)
        has_kept[kp] = True
        # docs >= window bytes with zero kept hashes: first window hash
        fb = np.flatnonzero(long_mask & ~has_kept)
        if len(fb):
            parts_p.append(fb.astype(np.int64))
            parts_h.append(all_h[off[fb] - lo])
        parts_p.append(kp)
        parts_h.append(kh)
    short = np.flatnonzero(~long_mask)
    if len(short):
        stexts = texts.take(pa.array(short)).to_pylist()
        crcs = np.fromiter((zlib.crc32(t.encode()) for t in stexts),
                           dtype=np.uint64, count=len(short))
        parts_p.append(short.astype(np.int64))
        parts_h.append(splitmix64(crcs))
    par = np.concatenate(parts_p)
    fps = np.concatenate(parts_h)
    order = np.lexsort((fps, par))
    return par[order], fps[order]


class FingerprintStage:
    def __init__(self, window: int = 8, keep_mod: int = 16):
        self.window, self.keep_mod = window, keep_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        par, fps = batch_rolling_fingerprints(
            _text_col(batch), self.window, self.keep_mod)
        counts = np.bincount(par, minlength=batch.num_rows)
        offsets = np.r_[0, np.cumsum(counts)].astype(np.int32)
        col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(fps.astype(np.int64)))
        return batch.append_column("fingerprint", col)


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         out_col: str = "norm") -> pa.Table:
    """Canonical text normalization (the pre-dedup/pre-tokenize cleanup
    of corpus pipelines): lowercase → non-[a-z0-9 ] runs → single space
    → collapse space runs → trim. Three RE2 kernel passes over the whole
    batch, zero per-row Python; pyarrow and DuckDB both run RE2, so the
    SQL twin (lower + regexp_replace 'g' + trim) is byte-identical."""
    x = pc.utf8_lower(batch.column(text_col))
    x = pc.replace_substring_regex(x, "[^a-z0-9 ]+", " ")
    x = pc.replace_substring_regex(x, " +", " ")
    return batch.append_column(out_col, pc.utf8_trim_whitespace(x))
