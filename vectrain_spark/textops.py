"""Pure-Python text operators shared by the Spark UDFs and the oracle.

Design rule (BASELINE.json input_hint): the distributed Arrow path must be
byte-identical per url to the single-process oracle.  We guarantee that by
construction: the pandas UDFs in ``operators/extract.py`` call *these exact
functions* per value inside Arrow batches, and ``oracle.py`` calls them in a
plain loop.  There is deliberately no second implementation to drift.

Reference analog: the reference's only text handling is carrying
``Entity.Text`` verbatim (/root/reference/pkg/types/entity.go:7) and
rejecting empty text at the HTTP source
(/root/reference/internal/app/sources/http/client.go:89-97).  Extraction /
triple rules are new surface mandated by BASELINE.json north_rule.
"""

from __future__ import annotations

import html as _htmlmod
import re
import zlib
from typing import NamedTuple

import numpy as np

# ---------------------------------------------------------------------------
# X2: boilerplate strip / text extraction
# ---------------------------------------------------------------------------

# Elements removed wholesale (content is boilerplate, not page text).
_BOILERPLATE_RE = re.compile(
    r"<(script|style|nav|header|footer|aside|noscript|head|title)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
# Block-level boundaries become newlines so paragraphs don't fuse.
_BLOCK_TAG_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|article|section|blockquote|"
    r"pre|body|html|head|title|main|figure|figcaption)\b[^>]*/?>",
    re.IGNORECASE,
)
_ANY_TAG_RE = re.compile(r"<[^>]+>")
_WS_RUN_RE = re.compile(r"[ \t\r\f\v]+")


class ExtractResult(NamedTuple):
    text: str | None
    error: str | None


def extract_text(html_bytes: bytes | None) -> ExtractResult:
    """Boilerplate-strip ``html`` (raw bytes) into page text.

    Deterministic rule pipeline:
      1. strict UTF-8 decode (undecodable page -> quarantine, never silently
         mangled — deliberate fix of the reference's store-broken-rows
         behavior, /root/reference/internal/app/pipeline/pipeline.go:259-264)
      2. drop comments and script/style/nav/header/footer/aside/noscript
      3. block tags -> newline, remaining tags stripped
      4. HTML entity unescape
      5. per-line horizontal-whitespace collapse + strip; drop empty lines
      6. join surviving lines with "\\n"

    Returns (text, None) or (None, error_code).
    """
    if html_bytes is None:
        return ExtractResult(None, "null_html")
    try:
        raw = bytes(html_bytes).decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return ExtractResult(None, "decode_error")
    s = _COMMENT_RE.sub(" ", raw)
    s = _BOILERPLATE_RE.sub(" ", s)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _ANY_TAG_RE.sub(" ", s)
    s = _htmlmod.unescape(s)
    lines = []
    for line in s.split("\n"):
        line = _WS_RUN_RE.sub(" ", line).strip(" ")
        if line:
            lines.append(line)
    text = "\n".join(lines)
    if not text:
        return ExtractResult(None, "empty_text")
    return ExtractResult(text, None)


# ---------------------------------------------------------------------------
# X4: mention detection + OpenIE-style triple extraction
# ---------------------------------------------------------------------------

# Closed predicate lexicon: surface phrase -> canonical predicate.
# Longest-phrase-first matching so "is the chief executive of" wins over
# any shorter overlap.
PREDICATE_PHRASES: list[tuple[str, str]] = [
    ("is the chief executive of", "ceo_of"),
    ("was founded by", "founded_by"),
    ("is headquartered in", "hq_in"),
    ("is located in", "located_in"),
    ("partnered with", "partnered_with"),
    ("invested in", "invested_in"),
    ("works for", "works_for"),
    ("acquired", "acquired"),
]

_PRED_RE = re.compile(
    r"\b(?:"
    + "|".join(re.escape(p) for p, _ in sorted(PREDICATE_PHRASES, key=lambda t: -len(t[0])))
    + r")\b"
)
_PRED_MAP = dict(PREDICATE_PHRASES)
_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")
# A mention: capitalized token run, optionally with '&', '-', digits inside.
_MENTION_TRIM_RE = re.compile(r"^[\s,;:\"'()]+|[\s,;:\"'()\.!?]+$")


class Triple(NamedTuple):
    subj: str
    pred: str
    obj: str
    sent_idx: int


def extract_triples(text: str | None) -> list[Triple]:
    """Rule-based OpenIE over extracted text.

    Sentence-split, then for each sentence find the FIRST predicate phrase;
    subject = trimmed span before it, object = trimmed span after it.
    A triple is emitted only when both spans are non-empty after trimming.
    Deterministic, order = (line order, sentence order).
    """
    if not text:
        return []
    out: list[Triple] = []
    sent_idx = 0
    for line in text.split("\n"):
        for sent in _SENT_SPLIT_RE.split(line):
            sent = sent.strip()
            if not sent:
                continue
            m = _PRED_RE.search(sent)
            if m:
                subj = _MENTION_TRIM_RE.sub("", sent[: m.start()])
                obj = _MENTION_TRIM_RE.sub("", sent[m.end():])
                if subj and obj:
                    out.append(Triple(subj, _PRED_MAP[m.group(0)], obj, sent_idx))
            sent_idx += 1
    return out


# ---------------------------------------------------------------------------
# L1: deterministic mention embedding (hashing-trick char n-grams)
# ---------------------------------------------------------------------------
# Stand-in for the reference's external embedding call
# (/root/reference/internal/app/embedders/ollama/embed_message.go:14-65,
# 768-d per /root/reference/config/kafka_config.yaml:37), made deterministic
# and in-process per SURVEY.md §2.3 L1.

EMBED_DIM = 768
_NGRAM = 3
_SIGN_SALT = b"\x9e\x37\x79\xb9"


def _ngrams(s: str, n: int = _NGRAM) -> list[bytes]:
    b = ("\x02" + s.lower() + "\x03").encode("utf-8")
    if len(b) <= n:
        return [b]
    return [b[i : i + n] for i in range(len(b) - n + 1)]


def embed_string(s: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Seeded hashing-trick char-trigram embedding, L2-normalized.

    crc32 is deterministic across platforms/processes (no PYTHONHASHSEED
    dependence), so the Spark path and the oracle produce bit-identical
    vectors.
    """
    v = np.zeros(dim, dtype=np.float64)
    for g in _ngrams(s):
        h = zlib.crc32(g)
        idx = h % dim
        sign = 1.0 if zlib.crc32(g + _SIGN_SALT) & 1 else -1.0
        v[idx] += sign
    n = np.linalg.norm(v)
    if n > 0:
        v /= n
    return v.astype(np.float32)


def embed_many(strings: list[str], dim: int = EMBED_DIM) -> np.ndarray:
    """Batch embed -> (len(strings), dim) float32 matrix."""
    if not strings:
        return np.zeros((0, dim), dtype=np.float32)
    return np.stack([embed_string(s, dim) for s in strings])


# ---------------------------------------------------------------------------
# L2: random-hyperplane LSH signatures (seeded; shared by Spark + oracle)
# ---------------------------------------------------------------------------

LSH_SEED = 42


def hyperplanes(dim: int, n_bits: int, seed: int = LSH_SEED) -> np.ndarray:
    """Seeded Gaussian hyperplanes, (dim, n_bits).  Same matrix on every
    executor — generated from the seed, never shipped, so the broadcast
    stays tiny."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits)).astype(np.float32)


def lsh_bands(vectors: np.ndarray, planes: np.ndarray, n_bands: int) -> np.ndarray:
    """Sign-bit signatures packed into per-band int64 codes.

    vectors: (n, dim); planes: (dim, n_bits) with n_bits % n_bands == 0.
    Returns (n, n_bands) int64.
    """
    n_bits = planes.shape[1]
    assert n_bits % n_bands == 0
    r = n_bits // n_bands
    bits = (vectors @ planes) >= 0  # (n, n_bits) bool
    weights = (1 << np.arange(r, dtype=np.int64))
    out = np.empty((vectors.shape[0], n_bands), dtype=np.int64)
    for b in range(n_bands):
        out[:, b] = bits[:, b * r : (b + 1) * r] @ weights
    return out


# ---------------------------------------------------------------------------
# Deterministic ids (content-addressed; fixes the reference's
# random-UUID-per-upsert duplicate-on-rerun semantics,
# /root/reference/internal/app/storages/qdrant/store.go:32 + TODO at :45)
# ---------------------------------------------------------------------------


def stable_id(*parts: str) -> int:
    """63-bit non-negative deterministic id from string parts (crc32 mix).

    Cheap, pure-Python-reproducible; used for mention ids and fallback
    entity ids so re-runs are idempotent.
    """
    h = 0
    for p in parts:
        h = (h * 1000003 + zlib.crc32(p.encode("utf-8"), h & 0xFFFFFFFF)) & 0x7FFFFFFFFFFFFFFF
    return h
