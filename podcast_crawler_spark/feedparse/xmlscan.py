"""Tolerant XML event scanner.

A from-scratch Python event scanner whose *observable behavior* matches what
the reference parser sees from quick_xml 0.31 with
``expand_empty_elements(true)`` (reference: ``/root/reference/src/
crawler_refactor/rss.rs:177-236``).  The quirks we must reproduce
(SURVEY.md §2.3 P1/P11/P12):

* **Attribute values are returned raw** — no entity unescaping.  quick_xml
  only unescapes attributes on demand, and the reference reads the raw value
  (``rss.rs:371-373``), so ``text="Society &amp; Culture"`` keeps the literal
  ``&amp;`` and a *bare* ``&`` inside an attribute value (ximalaya.xml:60)
  is tolerated.
* **Empty elements are expanded**: ``<enclosure .../>`` yields a ``start``
  followed immediately by an ``end`` event.
* **Text vs CDATA are distinct events**.  Text content is returned raw
  (entities NOT decoded here — the consumer calls :func:`xml_unescape`,
  mirroring ``BytesText::unescape`` at ``rss.rs:297``).  CDATA content is
  returned verbatim.
* **End-tag name checking** is on (quick_xml 0.31 default): a mismatched
  close tag is a scan error, surfaced with the buffer position like
  ``rss.rs:224-232``.

This module is pure Python with no Spark dependency so the golden tests can
run it standalone; at scale it executes inside Arrow-batched ``mapInPandas``
workers (one call per feed, thousands of feeds per batch).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator, List, Tuple


class XmlScanError(Exception):
    """Malformed-XML error with a buffer position (char offset)."""

    def __init__(self, message: str, pos: int):
        super().__init__(f"Error at position {pos}: {message}")
        self.message = message
        self.pos = pos


class XmlEscapeError(Exception):
    """Invalid entity reference during text unescape."""


@dataclass(frozen=True)
class XmlEvent:
    kind: str  # 'start' | 'end' | 'text' | 'cdata' | 'eof'
    name: str = ""
    attrs: Tuple[Tuple[str, str], ...] = ()
    text: str = ""


_WS = " \t\r\n"
_NAME_END = set(_WS) | {">", "/", "="}

_ENTITY_RE = re.compile(r"&(#x[0-9a-fA-F]+|#[0-9]+|[A-Za-z][A-Za-z0-9]*);")
_BUILTIN_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def xml_unescape(text: str) -> str:
    """Decode the five predefined XML entities plus numeric references.

    Unknown named entities or a dangling ``&`` raise :class:`XmlEscapeError`,
    matching quick_xml's strict ``unescape`` used for Text events
    (``rss.rs:297-304`` turns this into a feed-level parse failure).
    """
    out: List[str] = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch != "&":
            out.append(ch)
            i += 1
            continue
        m = _ENTITY_RE.match(text, i)
        if not m:
            raise XmlEscapeError(f"invalid entity reference at offset {i}")
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            out.append(chr(int(body[2:], 16)))
        elif body.startswith("#"):
            out.append(chr(int(body[1:])))
        else:
            rep = _BUILTIN_ENTITIES.get(body)
            if rep is None:
                raise XmlEscapeError(f"unknown entity '&{body};' at offset {i}")
            out.append(rep)
        i = m.end()
    return "".join(out)


def scan(doc: str) -> Iterator[XmlEvent]:
    """Yield XML events over *doc*; raise :class:`XmlScanError` on malformed
    markup.  Empty elements are expanded to start+end pairs."""
    i = 0
    n = len(doc)
    stack: List[str] = []
    while i < n:
        lt = doc.find("<", i)
        if lt == -1:
            if doc[i:].strip("\x00") != "" or i < n:
                yield XmlEvent("text", text=doc[i:])
            break
        if lt > i:
            yield XmlEvent("text", text=doc[i:lt])
        i = lt
        if doc.startswith("<!--", i):
            end = doc.find("-->", i + 4)
            if end == -1:
                raise XmlScanError("unterminated comment", i)
            i = end + 3
        elif doc.startswith("<![CDATA[", i):
            end = doc.find("]]>", i + 9)
            if end == -1:
                raise XmlScanError("unterminated CDATA", i)
            yield XmlEvent("cdata", text=doc[i + 9 : end])
            i = end + 3
        elif doc.startswith("<!", i):
            end = doc.find(">", i)  # DOCTYPE etc. — skipped like Event::DocType
            if end == -1:
                raise XmlScanError("unterminated markup declaration", i)
            i = end + 1
        elif doc.startswith("<?", i):
            end = doc.find("?>", i + 2)
            if end == -1:
                raise XmlScanError("unterminated processing instruction", i)
            i = end + 2
        elif doc.startswith("</", i):
            end = doc.find(">", i)
            if end == -1:
                raise XmlScanError("unterminated end tag", i)
            name = doc[i + 2 : end].strip(_WS)
            if not stack:
                raise XmlScanError(f"close tag </{name}> with no open element", i)
            expected = stack.pop()
            if name != expected:
                raise XmlScanError(
                    f"expected </{expected}>, found </{name}>", i
                )
            yield XmlEvent("end", name=name)
            i = end + 1
        else:
            name, attrs, self_closing, i = _scan_start_tag(doc, i)
            yield XmlEvent("start", name=name, attrs=tuple(attrs))
            if self_closing:
                yield XmlEvent("end", name=name)
            else:
                stack.append(name)
    yield XmlEvent("eof")


def _scan_start_tag(doc: str, i: int) -> Tuple[str, List[Tuple[str, str]], bool, int]:
    n = len(doc)
    start = i
    i += 1  # past '<'
    j = i
    while j < n and doc[j] not in _NAME_END:
        j += 1
    name = doc[i:j]
    if not name:
        raise XmlScanError("empty tag name", start)
    i = j
    attrs: List[Tuple[str, str]] = []
    seen_keys = set()
    while True:
        while i < n and doc[i] in _WS:
            i += 1
        if i >= n:
            raise XmlScanError("unterminated start tag", start)
        if doc[i] == ">":
            return name, attrs, False, i + 1
        if doc[i] == "/":
            if i + 1 < n and doc[i + 1] == ">":
                return name, attrs, True, i + 2
            raise XmlScanError("stray '/' in start tag", i)
        j = i
        while j < n and doc[j] not in _NAME_END:
            j += 1
        key = doc[i:j]
        if not key:
            raise XmlScanError("malformed attribute", i)
        i = j
        while i < n and doc[i] in _WS:
            i += 1
        if i >= n or doc[i] != "=":
            raise XmlScanError(f"attribute '{key}' without value", i)
        i += 1
        while i < n and doc[i] in _WS:
            i += 1
        if i >= n or doc[i] not in "\"'":
            raise XmlScanError(f"unquoted value for attribute '{key}'", i)
        quote = doc[i]
        end = doc.find(quote, i + 1)
        if end == -1:
            raise XmlScanError(f"unterminated value for attribute '{key}'", i)
        # Raw value: entities left intact, bare '&' tolerated (P12).
        value = doc[i + 1 : end]
        if key in seen_keys:
            raise XmlScanError(f"duplicate attribute '{key}'", i)
        seen_keys.add(key)
        attrs.append((key, value))
        i = end + 1
