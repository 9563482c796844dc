"""RSS feed parser — streaming event state machine.

From-scratch reimplementation of the reference's parser semantics
(``/root/reference/src/crawler_refactor/rss.rs:172-611``; the legacy copy at
``src/crawler/rss.rs`` is semantically identical, SURVEY.md §2.3).  Pinned by
golden tests ported from ``/root/reference/tests/rss_parser_test.rs`` and
``tests/crawler_test.rs``.

Faithfully reproduced quirks:

* State machine ``Initial → InPodcast`` on ``<channel>`` (which *re-creates*
  the podcast record), ``→ InEpisode`` on ``<item>``, back on ``</item>``,
  ``Finished`` on ``</channel>`` (``rss.rs:264-279,336-344``).
* **Sticky current tag** (P11): set on every start event, never cleared on
  end events — nested ``itunes:owner/itunes:name`` works *because* of this
  (``rss.rs:193``).
* Text events: XML-unescape → ammonia-clean → skip if blank; **last
  non-blank text wins** for scalar fields, list fields append
  (``rss.rs:296-329,764-777``).  CDATA content is taken raw (no XML
  unescape) then cleaned (``rss.rs:212-218``).
* Attribute values raw, no entity decode (P12); only the enclosure ``url``
  gets ``&amp;``→``&`` and, for non-http URLs, ``//``→``/``
  (``rss.rs:456-470``).
* Strict mode: missing enclosure ``url`` attr or unparseable ``length``
  fails the feed (``rss.rs:476-500``); invalid ``link`` URLs fail the feed
  (``rss.rs:514-521``); empty podcast/episode ``title`` fails the feed
  (``rss.rs:104-128,505-512``).
* Episode ``keywords``/``category`` are never populated (the reference's
  episode field map has no entry for them, ``rss.rs:416-438``);
  ``lastBuildDate`` and channel ``pubDate`` are ignored.

Output is plain dicts (Arrow-friendly) so the same function serves the
pandas oracle and the Spark ``mapInPandas`` parse stage.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Dict, List, Optional, Tuple

from .sanitize import clean_text
from .scalars import parse_bool, parse_date, validate_url
from .xmlscan import XmlEscapeError, XmlScanError, scan, xml_unescape

# error taxonomy mirrors AppError/ParseErrorKind
# (/root/reference/src/infrastructure/error/mod.rs:51-75)
KIND_INVALID_XML = "invalid_xml"
KIND_MISSING_FIELD = "missing_field"
KIND_INVALID_FORMAT = "invalid_format"
KIND_OTHER = "parse_other"


class FeedParseError(Exception):
    def __init__(self, kind: str, message: str, url: str):
        super().__init__(f"[{kind}] {message} (feed {url})")
        self.kind = kind
        self.message = message
        self.url = url


def _new_podcast(url: str) -> Dict:
    return {
        "title": "",
        "description": None,
        "link": None,
        "last_build_date": None,  # schema parity; parser never sets it
        "language": None,
        "copyright": None,
        "image_url": None,
        "rss_feed_url": url,
        "category": None,
        "author": None,
        "owner_name": None,
        "owner_email": None,
        "keywords": None,
        "explicit": None,
        "summary": None,
        "subtitle": None,
    }


def _new_episode() -> Dict:
    return {
        "episode_image_url": None,
        "title": "",
        "description": None,
        "link": None,
        "pub_date": None,
        "guid": None,
        "enclosure_url": None,
        "enclosure_type": None,
        "enclosure_length": None,
        "explicit": None,
        "subtitle": None,
        "author": None,
        "summary": None,
        "keywords": None,  # never populated (see module docstring)
        "category": None,  # never populated
        "duration": None,
    }


_ST_INITIAL, _ST_PODCAST, _ST_EPISODE, _ST_FINISHED = range(4)


@dataclass
class _State:
    url: str
    state: int = _ST_INITIAL
    current_tag: str = ""
    podcast: Optional[Dict] = None
    episode: Optional[Dict] = None
    episodes: List[Dict] = field(default_factory=list)


@dataclass
class ParserConfig:
    """Mirrors ``ParserConfig`` defaults (``rss.rs:150-159``)."""

    clean_html: bool = True
    validate_urls: bool = True
    allow_empty_required: bool = False
    strict_mode: bool = True


def _attr(attrs: Tuple[Tuple[str, str], ...], name: str) -> Optional[str]:
    for k, v in attrs:
        if k == name:
            return v
    return None


def _append(record: Dict, key: str, value: str) -> None:
    if record[key] is None:
        record[key] = []
    record[key].append(value)


def parse_feed(
    content: bytes, url: str, config: ParserConfig = ParserConfig()
) -> Tuple[Dict, List[Dict]]:
    """Parse RSS bytes → (podcast dict, [episode dicts]).

    Raises :class:`FeedParseError` on any condition that fails the feed in
    the reference.
    """
    doc = content.decode("utf-8", errors="replace")
    st = _State(url=url, podcast=_new_podcast(url))

    def check_url(text: str) -> None:
        if config.validate_urls and not validate_url(text):
            raise FeedParseError(
                KIND_INVALID_FORMAT, f"Invalid link URL: {text}", url
            )

    def handle_enclosure(attrs: Tuple[Tuple[str, str], ...]) -> None:
        if st.episode is None:
            raise FeedParseError(
                KIND_OTHER, "Enclosure tag found outside of episode context", url
            )
        found_url = ",url not found"
        error_msg = ""
        for key, value in attrs:
            if key == "url":
                decoded = value.replace("&amp;", "&")
                normalized = (
                    decoded if decoded.startswith("http") else decoded.replace("//", "/")
                )
                check_url(normalized)
                st.episode["enclosure_url"] = normalized
                found_url = ""
            elif key == "type":
                st.episode["enclosure_type"] = value
            elif key == "length":
                try:
                    st.episode["enclosure_length"] = int(value)
                except ValueError:
                    if config.strict_mode:
                        error_msg = f"Invalid enclosure length: {value}"
        error_msg += found_url
        if error_msg and config.strict_mode:
            raise FeedParseError(KIND_MISSING_FIELD, error_msg, url)

    def handle_podcast_start(attrs) -> None:
        tag, p = st.current_tag, st.podcast
        if tag == "link":
            href = _attr(attrs, "href")
            if href is not None:
                check_url(href)
                p["link"] = href
        elif tag == "itunes:image":
            href = _attr(attrs, "href")
            if href is not None:
                check_url(href)
                p["image_url"] = href
        elif tag == "itunes:category":
            text = _attr(attrs, "text")
            if text is not None:
                _append(p, "category", text)

    def handle_episode_start(attrs) -> None:
        tag, e = st.current_tag, st.episode
        if tag == "enclosure":
            handle_enclosure(attrs)
        elif tag == "itunes:image":
            href = _attr(attrs, "href")
            if href is not None:
                check_url(href)
                e["episode_image_url"] = href

    def handle_podcast_text(text: str) -> None:
        tag, p = st.current_tag, st.podcast
        if tag == "title":
            p["title"] = text
        elif tag == "description":
            p["description"] = text
        elif tag == "language":
            p["language"] = text
        elif tag == "copyright":
            p["copyright"] = text
        elif tag == "itunes:author":
            p["author"] = text
        elif tag == "itunes:name":
            p["owner_name"] = text
        elif tag == "itunes:email":
            p["owner_email"] = text
        elif tag == "itunes:category":
            _append(p, "category", text)
        elif tag == "itunes:keywords":
            _append(p, "keywords", text)
        elif tag == "itunes:explicit":
            p["explicit"] = parse_bool(text)
        elif tag == "itunes:summary":
            p["summary"] = text
        elif tag == "itunes:subtitle":
            p["subtitle"] = text
        elif tag == "link":
            check_url(text)
            p["link"] = text

    def handle_episode_text(text: str) -> None:
        tag, e = st.current_tag, st.episode
        if tag == "title":
            e["title"] = text
        elif tag == "description":
            e["description"] = text
        elif tag == "pubDate":
            e["pub_date"] = parse_date(text)
        elif tag == "guid":
            e["guid"] = text
        elif tag == "itunes:duration":
            e["duration"] = text
        elif tag == "itunes:author":
            e["author"] = text
        elif tag == "itunes:subtitle":
            e["subtitle"] = text
        elif tag == "itunes:summary":
            e["summary"] = text
        elif tag == "itunes:explicit":
            e["explicit"] = parse_bool(text)
        elif tag == "link":
            check_url(text)
            e["link"] = text

    def handle_text(raw: str, is_cdata: bool) -> None:
        if is_cdata:
            text = raw  # CDATA: no XML unescape (rss.rs:212-218)
        else:
            try:
                text = xml_unescape(raw)
            except XmlEscapeError as exc:
                raise FeedParseError(
                    KIND_INVALID_XML, f"Failed to unescape text: {exc}", url
                ) from exc
        if config.clean_html:
            text = clean_text(text)
        if not text.strip() and not config.allow_empty_required:
            return
        if st.state == _ST_PODCAST:
            handle_podcast_text(text)
        elif st.state == _ST_EPISODE:
            handle_episode_text(text)

    try:
        for ev in scan(doc):
            if ev.kind == "start":
                st.current_tag = ev.name
                if ev.name == "channel":
                    st.state = _ST_PODCAST
                    st.podcast = _new_podcast(url)
                elif ev.name == "item":
                    st.state = _ST_EPISODE
                    st.episode = _new_episode()
                elif st.state == _ST_PODCAST:
                    handle_podcast_start(ev.attrs)
                elif st.state == _ST_EPISODE:
                    handle_episode_start(ev.attrs)
            elif ev.kind == "end":
                if ev.name == "channel" and st.state == _ST_PODCAST:
                    st.state = _ST_FINISHED
                elif ev.name == "item" and st.state == _ST_EPISODE:
                    ep = st.episode
                    st.episode = None
                    if ep is not None:
                        if not ep["title"]:
                            raise FeedParseError(
                                KIND_MISSING_FIELD, "Missing episode title", url
                            )
                        st.episodes.append(ep)
                    st.state = _ST_PODCAST
            elif ev.kind == "text":
                handle_text(ev.text, is_cdata=False)
            elif ev.kind == "cdata":
                handle_text(ev.text, is_cdata=True)
            else:  # eof
                break
    except XmlScanError as exc:
        raise FeedParseError(KIND_INVALID_XML, str(exc), url) from exc

    if not st.podcast["title"]:
        raise FeedParseError(KIND_MISSING_FIELD, "Missing podcast title", url)
    return st.podcast, st.episodes


def extract_text(podcast: Dict, episodes: List[Dict]) -> str:
    """Canonical "extracted text" of a feed — the per-url byte-identity
    invariant (BASELINE.json input_hint).  Defined as the cleaned podcast
    title/description followed by each episode's cleaned title/description,
    newline-joined (all values already passed through :func:`clean_text`)."""
    parts = [podcast["title"], podcast["description"] or ""]
    for ep in episodes:
        parts.append(ep["title"])
        parts.append(ep["description"] or "")
    return "\n".join(parts)


def parse_feed_result(content: Optional[bytes], url: str) -> Dict:
    """Non-raising wrapper: one dict per fetched page, carrying either the
    parse output or the error taxonomy row (SURVEY.md §2.9 R5)."""
    if content is None:
        return {
            "podcast": None,
            "episodes": None,
            "text": None,
            "error_kind": "network",
            "error_message": "fetch returned no content",
        }
    try:
        podcast, episodes = parse_feed(content, url)
    except FeedParseError as exc:
        return {
            "podcast": None,
            "episodes": None,
            "text": None,
            "error_kind": exc.kind,
            "error_message": exc.message,
        }
    return {
        "podcast": podcast,
        "episodes": episodes,
        "text": extract_text(podcast, episodes),
        "error_kind": None,
        "error_message": None,
    }
