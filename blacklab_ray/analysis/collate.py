"""Collated term ordering — the Terms sort-rank machinery.

The reference keeps two sort orders over the term dictionary, built
with ICU collators (Terms.java:69-95; TermsIntegrated.java:145-215):
an INSENSITIVE order (case/accent folded; terms equal under the fold
share a sort position) and a SENSITIVE order (full collation:
base letters first, then accents, then case — so "Cafe"/"café"/"cafe"
group next to each other instead of scattering by byte value the way
a codepoint sort scatters them). Context sort and dictionary listings
compare those rank arrays, not raw strings.

No ICU is available here, so this is a DUCET-lite three-level key
built from public Unicode normalization primitives (UAX #15 / UTS #10
level structure):

- level 1 (primary):  lowercase + accent-strip (the analyzer's
  desensitize fold) — base-letter order;
- level 2 (secondary): NFC of the lowercased term — accent
  differences;
- level 3 (tertiary):  NFC of the original term — case differences.

Keys are bytes (levels joined by 0x00, which sorts below any UTF-8
content byte) so plain lexicographic comparison of keys IS the
collated comparison. ``key_for_context`` joins per-word keys with
0x01 — comparing joined keys word-by-word is exactly the reference's
rank-array comparison (HitPropertyContextWords semantics).
"""
from __future__ import annotations

import unicodedata
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from blacklab_ray.analysis.analyzers import desensitize_term

__all__ = ["collation_key", "sort_terms", "term_sort_ranks",
           "key_for_context", "collation_key_column"]


# The reference's V2 insensitive collator (Collators.java:55-80 +
# TestValueSort.testValueSortV2): PRIMARY strength over the
# desensitized string with the Java rule-based punctuation order —
# spaces < dash < underscore < other punctuation
# (, ; : ! ? . ' " ( ) [ ] { } @ * / \ & # % ` ^ + < = > | ~ $)
# < digits < letters — and the V2 rule edit putting
# ' ' < '-' < '_'. Chars get a class-prefixed weight so plain byte
# comparison of keys reproduces that order.
_PUNCT_ORDER = " -_,;:!?.'\"()[]{}@*/\\&#%`^+<=>|~$"
_PRIM_MAP = {ch: bytes((0x02, 0x20 + i))
             for i, ch in enumerate(_PUNCT_ORDER)}


def _primary_bytes(s: str) -> bytes:
    if not s:
        return b""
    out = bytearray()
    for ch in s:
        w = _PRIM_MAP.get(ch)
        if w is not None:
            out += w
        elif "0" <= ch <= "9":
            out += b"\x03" + ch.encode()
        else:
            out += b"\x04" + ch.encode("utf-8")
    return bytes(out)


def collation_key(term: str, sensitive: bool = True) -> bytes:
    """Byte sort key; lexicographic order of keys == collated order.

    ``sensitive=False`` keys only on the primary level (terms equal
    under the fold compare equal — the insensitive collator)."""
    primary = _primary_bytes(desensitize_term(term))
    if not sensitive:
        return primary
    secondary = unicodedata.normalize("NFC", term.lower())
    # tertiary (case) level: ICU orders lowercase BEFORE uppercase —
    # swapcase makes byte comparison produce that order
    tertiary = unicodedata.normalize("NFC", term).swapcase()
    return b"\x00".join((primary, secondary.encode(),
                         tertiary.encode()))


def sort_terms(terms: Iterable[str], sensitive: bool = True) -> list[str]:
    """Dictionary order (ties under an insensitive sort broken by the
    full key so the result is deterministic)."""
    return sorted(terms, key=lambda t: collation_key(t, True)) \
        if sensitive else \
        sorted(terms, key=lambda t: (collation_key(t, False),
                                     collation_key(t, True)))


def term_sort_ranks(terms: list[str],
                    sensitive: bool = True) -> np.ndarray:
    """Sort position per input term (Terms.idToSortPosition).

    Sensitive: unique dense ranks. Insensitive: terms equal under the
    fold SHARE a rank (the reference's termsEqual(..., INSENSITIVE)
    contract)."""
    keys = [collation_key(t, sensitive) for t in terms]
    uniq = sorted(set(keys))
    pos = {k: i for i, k in enumerate(uniq)}
    return np.array([pos[k] for k in keys], dtype=np.int64)


def key_for_context(words: str, sensitive: bool = True) -> bytes:
    """Key for a space-joined context string: per-word keys joined by
    0x01 (< any content byte, > the 0x00 level separator) — byte
    comparison of these equals word-by-word rank comparison."""
    return b"\x01".join(collation_key(w, sensitive)
                        for w in words.split(" ") if w) if words else b""


def collation_key_column(col: pa.Array | pa.ChunkedArray,
                         sensitive: bool = True,
                         context: bool = False) -> pa.Array:
    """Hex-encoded collation keys for a string column (hex preserves
    byte order and stays sortable by every string sorter). Runs the
    Python key fn over the column's UNIQUE values only (dictionary
    encode), like the analyzer's accent-strip path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    fn = key_for_context if context else collation_key
    dict_arr = pc.dictionary_encode(col)
    uniq = dict_arr.dictionary.to_pylist()
    keys = pa.array([fn(u, sensitive).hex() if u is not None else None
                     for u in uniq], pa.string())
    return pc.take(keys, dict_arr.indices)


_V1_IGNORED = str.maketrans({" ": None, "-": None, "_": None})


def sort_terms_v1(terms: Iterable[str]) -> list[str]:
    """The LEGACY V1 insensitive collator order
    (Collators.CollatorVersion.V1, TestValueSort.testValueSortV1):
    PRIMARY strength of the stock Java collator, which IGNORES dash,
    space and underscore entirely ('a-' ≡ 'a', 'cool stuff' ≡
    'cool-stuff' ≡ 'cool_stuff'); ties keep input order (Java
    List.sort is stable). V2 — the default everywhere else in this
    engine — stopped ignoring them (Collators.java:55-80)."""
    return sorted(terms, key=lambda t: _primary_bytes(
        desensitize_term(t).translate(_V1_IGNORED)))
