"""CHAT transcription format (CHILDES/TalkBank) reader.

Semantics from the reference's DocIndexerChat
(indexers/config/DocIndexerChat.java:44, itself a port of the public
chamd converter): one document per file;

- ``@Header:\tvalue`` lines are document metadata; names are despaced
  (``@Birth of CHI`` → ``birth_of_chi``), ages like ``3;6.14`` (y;m.d)
  convert to a months integer (getMonths:303 — 12*y + m, day ignored);
- ``*SPK:\tutterance`` lines are utterances: speaker code + content;
  lines starting with a TAB continue the previous line
  (combineLines:277);
- ``%tier:\tvalue`` dependent tiers attach to the current utterance;
- utterance text is cleaned of a documented SUBSET of CHAT markup
  (cleanText:967 implements the full manual; here: scoped ``<…> [x/%/…]``
  groups keep their ``<…>`` content, bare ``[…]`` annotation groups are
  dropped, pauses ``(.)``/``(..)``, events ``&=word`` and fragments
  ``&word`` are removed, and ``xxx/yyy/www`` unintelligible markers are
  kept as tokens);
- each utterance becomes a ``<u speaker="SPK" uttid="N"/>`` standoff
  tag span over its token range, so CQL ``within <u speaker="CHI"/>``
  works exactly like the reference's per-utterance blocks.

The reader produces the canonical pages schema + ``tags``; parsing runs
inside map_batches tasks (one file per row), never on the driver.
"""

from __future__ import annotations

import re

import pyarrow as pa

_AGE_SEPS = re.compile(r"[;.]")
_SCOPED = re.compile(r"<([^<>]*)>\s*\[[^\]]*\]")   # <...> [x ...] → ...
_BRACKET = re.compile(r"\[[^\]]*\]")               # [...] → drop
_PAUSE = re.compile(r"\(\.{1,3}\)")
_EVENT = re.compile(r"&=?\S+")
_WS = re.compile(r"\s+")


def despace_name(name: str) -> str:
    """``Birth of CHI`` → ``birth_of_chi`` (despaceMetadataName:285)."""
    return re.sub(r"\s+", "_", name.strip()).lower()


def age_to_months(age: str) -> int | None:
    """``y;m.d`` → 12*y + m (day ignored); None when uninterpretable
    (getMonths:303 returns 0 + logs; None is more honest here)."""
    parts = _AGE_SEPS.split(age.strip())
    if not parts or not (1 <= len(parts) <= 3):
        return None
    if not re.fullmatch(r"[0-9]+", parts[0]):
        return None
    months = 0
    if len(parts) >= 2 and parts[1]:
        if not re.fullmatch(r"[0-9]{1,2}", parts[1]):
            return None
        months = int(parts[1])
    return 12 * int(parts[0]) + months


def clean_utterance(s: str) -> str:
    """Documented subset of DocIndexerChat.cleanText (see module doc)."""
    prev = None
    while prev != s:
        prev = s
        s = _SCOPED.sub(r"\1", s)
    s = _BRACKET.sub(" ", s)
    s = _PAUSE.sub(" ", s)
    s = _EVENT.sub(" ", s)
    return _WS.sub(" ", s).strip()


def parse_chat(content: str) -> dict:
    """Parse one CHAT file → ``{"metadata": {...}, "utterances":
    [{"uttid", "speaker", "text", "tiers": {...}}, ...]}``."""
    # join continuation lines (combineLines: tab-led lines append)
    lines: list[str] = []
    for raw in content.splitlines():
        if not raw:
            continue
        if raw[0] == "\t" and lines:
            lines[-1] += " " + raw.strip()
        else:
            lines.append(raw)
    metadata: dict = {}
    utterances: list[dict] = []
    uttid = 0
    for line in lines:
        c = line[0]
        if c == "@":
            body = line[1:]
            if ":" in body:
                name, _, value = body.partition(":")
                key = despace_name(name)
                value = value.strip()
                metadata[key] = value
                if key.startswith("age") or key.endswith("age"):
                    m = age_to_months(value)
                    if m is not None:
                        metadata[key + "_months"] = m
            else:
                # marker headers (@Begin, @End, @UTF8): record presence
                metadata.setdefault("markers", []).append(
                    despace_name(body))
        elif c == "*":
            spk, sep, text = line[1:].partition(":")
            if not sep:
                continue
            utterances.append({
                "uttid": uttid,
                "speaker": spk.strip(),
                "text": clean_utterance(text),
                "tiers": {},
            })
            uttid += 1
        elif c == "%":
            tier, sep, value = line[1:].partition(":")
            if sep and utterances:
                utterances[-1]["tiers"][tier.strip()] = value.strip()
    return {"metadata": metadata, "utterances": utterances}


TAG_TYPE = pa.list_(pa.struct([("name", pa.string()),
                               ("start", pa.int32()),
                               ("end", pa.int32()),
                               ("attrs", pa.string())]))


def chat_to_page(path: str, content: str) -> dict:
    """One CHAT file → one pages-schema row (+ utterance tag spans).

    Token ranges for the ``<u/>`` spans use the standard analyzer's
    token counts of each utterance, so spans align with the index's
    tokenization of the joined text."""
    from blacklab_ray.analysis.analyzers import tokenize_text
    parsed = parse_chat(content)
    texts = [u["text"] for u in parsed["utterances"]]
    spans = []
    pos = 0
    for u, t in zip(parsed["utterances"], texts):
        n = len(tokenize_text(t))
        spans.append({"name": "u", "start": pos, "end": pos + n,
                      "attrs": f"speaker={u['speaker']};"
                               f"uttid={u['uttid']}"})
        pos += n
    doc_text = "\n".join(texts)
    return {
        "url": path,
        "warc_ts": None,
        "html": content.encode("utf-8"),
        "text": doc_text,
        "lang": parsed["metadata"].get("languages"),
        "tags": spans,
    }
