"""Vectorized text analysis: tokens, quality, language-ID, fingerprints.

Training-data-pipeline operators over the ``documents`` table. All stateless
per-batch functions (compiled patterns cached at module import — the K6
one-time-setup pattern, reference ``login.py:15-61``); the checksum
fingerprint is the engine's analog of the reference's POSIX cksum / MD5
integrity hashes (``cksum.py:9-66``, ``LPDAACDataPool.py:233-238``).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_TOKEN_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[.,;:!?]")

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic (deterministic; no external models in this container).
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is that it for on with as".split()),
    "fr": frozenset("le la les de et un une des du est pour que dans".split()),
    "es": frozenset("el la los las de y un una del es para que en".split()),
    "de": frozenset("der die das und ein eine von ist mit für dass im".split()),
    "zh": frozenset("的 了 是 在 我 有 和 就 不 人 都 一".split()),
}


def token_count(texts: pd.Series) -> pd.Series:
    """Whitespace-token count — count of ``\\S+`` matches (vectorized)."""
    return texts.str.count(_TOKEN_RE).astype("int64")


def quality_features(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Length / punctuation / token-shape quality features per document."""
    t = df[text_col]
    n_chars = t.str.len().astype("int64")
    n_tokens = token_count(t)
    n_punct = t.str.count(_PUNCT_RE).astype("int64")
    n_nonspace = t.str.count(r"\S").astype("int64")
    out = df.copy()
    out["n_chars_calc"] = n_chars
    out["n_tokens"] = n_tokens
    out["n_punct"] = n_punct
    out["avg_token_len"] = np.where(n_tokens > 0, n_nonspace / n_tokens.replace(0, 1), 0.0)
    out["punct_ratio"] = np.where(n_chars > 0, n_punct / n_chars.replace(0, 1), 0.0)
    return out


def detect_language(texts: pd.Series) -> pd.Series:
    """Stopword-overlap language ID over the marker sets (deterministic;
    ties broken by language code order). Rows-only oracle — not
    SQL-expressible."""
    langs = sorted(_LANG_MARKERS)

    def _score(text: str) -> str:
        words = text.lower().split()
        if not words:
            return "und"
        best_lang, best = "und", 0
        for lang in langs:
            markers = _LANG_MARKERS[lang]
            score = sum(1 for w in words if w in markers)
            if score > best:
                best_lang, best = lang, score
        return best_lang

    return texts.map(_score)


def fingerprint_md5(texts: pd.Series) -> pd.Series:
    """MD5 hex digest per document (matches DuckDB's ``md5(text)``)."""
    return texts.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique 64-bit hashes of word k-shingles (for MinHash/Jaccard)."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    h = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
            for s in shingles
        ),
        dtype=np.uint64,
        count=len(shingles),
    )
    return np.unique(h)


#: BPE-ish tokenizer-shape proxy: letter runs, single digits, single
#: symbol characters. Chosen so Python ``re`` and DuckDB's RE2 agree
#: exactly (no lookarounds, no backrefs).
BPEISH_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")


def char_ngram_hashes(text: str, k: int = 4) -> np.ndarray:
    """uint64 hash per character k-gram (rolling window over raw bytes);
    empty for texts shorter than k. Vectorized sliding windows."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        return np.empty(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = win[:, 0].copy()
        for j in range(1, k):
            h = h * np.uint64(0x100000001B3) + win[:, j]  # FNV-ish roll
    return h


def winnow_fingerprints(text: str, k: int = 5, window: int = 4) -> np.ndarray:
    """Winnowing document fingerprints (Schleimer et al.): k-gram rolling
    hashes -> per-window minimum (rightmost tie-break) -> consecutive
    dedup. Guarantees any shared substring of length >= k + window - 1
    between two documents yields a shared fingerprint."""
    h = char_ngram_hashes(text, k)
    if len(h) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(h) <= window:
        return np.unique(h.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(h, window)
    # rightmost minimum per window (reverse, argmin, map back); the
    # fingerprint SET is what matters downstream, so a final unique
    # subsumes the classic consecutive-duplicate drop
    rev = win[:, ::-1]
    pos = (window - 1) - rev.argmin(axis=1)
    sel = win[np.arange(len(win)), pos]
    return np.unique(sel)
