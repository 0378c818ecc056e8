"""RSSConnector: RSS 2.0 / Atom feed items published as documents
(reference: connector/RSSConnector.java:1-213; parsing is from scratch on
stdlib xml.etree since the apptastic rssreader is a JVM library).

Contract parity:
- item fields (RSSConnector.java:155-196): author, categories (list),
  comments, content, description, enclosures (list of {type,url,length}),
  guid, isPermaLink, link, title, pubDate
- doc id = guid when use_guid_for_doc_id and present, else a UUID
  (:157-166); deterministic fallback available for testing
- pub_date_cutoff (:96-99,199-213): only items whose pubDate falls within
  the duration before "now" are published; items WITHOUT a pubDate are
  always published
- incremental refresh (:99-152): run_duration + refresh_increment must be
  set together; each refresh publishes only items not seen in the PREVIOUS
  refresh (itemsProcessedLastRefresh semantics, including the
  don't-replace-on-empty-fetch guard :134-137)

Feeds are driver-sized (a feed document is KBs); the parse happens on the
driver and lands in a DataFrame. For ingesting MANY feeds, distribute the
URL list and use FetchUri (pipeline/stages.py) + parse_feed per row.
"""

from __future__ import annotations

import re
import time
import uuid
import xml.etree.ElementTree as ET
from email.utils import parsedate_to_datetime
from typing import Callable, List, Optional

from pyspark.sql import DataFrame, SparkSession

_DUR = re.compile(r"^\s*(\d+)\s*(ms|s|m|h|d)?\s*$")
_MULT = {"ms": 0.001, "s": 1, "m": 60, "h": 3600, "d": 86400, None: 1}

ITEM_SCHEMA = (
    "id string, author string, categories array<string>, comments string, "
    "content string, description string, "
    "enclosures array<struct<type:string,url:string,length:bigint>>, "
    "guid string, isPermaLink boolean, link string, title string, "
    "pubDate timestamp"
)


def parse_duration(s: str | int | float) -> float:
    """HOCON-style duration string ('3s', '2m', '1h', '2d') -> seconds."""
    if isinstance(s, (int, float)):
        return float(s)
    m = _DUR.match(s)
    if not m:
        raise ValueError(f"bad duration {s!r}")
    return int(m.group(1)) * _MULT[m.group(2)]


def _text(el) -> Optional[str]:
    return el.text.strip() if el is not None and el.text else None


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_date(s: Optional[str]):
    if not s:
        return None
    try:
        return parsedate_to_datetime(s)      # RFC 822 (RSS)
    except (TypeError, ValueError):
        pass
    try:
        from datetime import datetime

        return datetime.fromisoformat(s.replace("Z", "+00:00"))  # Atom
    except ValueError:
        return None


def parse_feed(xml_text: str) -> List[dict]:
    """RSS 2.0 <item> / Atom <entry> elements -> list of item dicts."""
    root = ET.fromstring(xml_text)
    items = []
    for el in root.iter():
        if _strip_ns(el.tag) not in ("item", "entry"):
            continue
        it: dict = {"categories": [], "enclosures": []}
        for c in el:
            tag = _strip_ns(c.tag)
            if tag in ("author", "creator"):
                # Atom author is a struct with <name>
                name = c.find("{*}name") if len(c) else None
                it["author"] = _text(name) or _text(c)
            elif tag == "category":
                v = _text(c) or c.get("term")
                if v:
                    it["categories"].append(v)
            elif tag == "comments":
                it["comments"] = _text(c)
            elif tag in ("encoded", "content"):   # content:encoded / Atom
                it["content"] = _text(c)
            elif tag in ("description", "summary"):
                it["description"] = _text(c)
            elif tag == "enclosure":
                length = c.get("length")
                it["enclosures"].append({
                    "type": c.get("type"), "url": c.get("url"),
                    "length": int(length) if length else None})
            elif tag in ("guid", "id"):
                it["guid"] = _text(c)
                ipl = c.get("isPermaLink")
                if ipl is not None:
                    it["isPermaLink"] = ipl.lower() == "true"
            elif tag == "link":
                it["link"] = _text(c) or c.get("href")
            elif tag == "title":
                it["title"] = _text(c)
            elif tag in ("pubDate", "published", "updated"):
                if "pubDate" not in it or tag != "updated":
                    it["pubDate"] = _parse_date(_text(c))
        items.append(it)
    return items


class RSSConnector:
    def __init__(self, spark: SparkSession, rss_url: str,
                 use_guid_for_doc_id: bool = True,
                 pub_date_cutoff: Optional[str] = None,
                 run_duration: Optional[str] = None,
                 refresh_increment: Optional[str] = None,
                 fetch: Optional[Callable[[str], str]] = None,
                 now: Optional[Callable[[], float]] = None):
        if (run_duration is None) != (refresh_increment is None):
            raise ValueError(
                "runDuration and refreshIncrement must both be defined to "
                "run incrementally (RSSConnector.java:86-88)")
        self.spark = spark
        self.rss_url = rss_url
        self.use_guid = use_guid_for_doc_id
        self.cutoff_sec = (parse_duration(pub_date_cutoff)
                           if pub_date_cutoff else None)
        self.run_sec = parse_duration(run_duration) if run_duration else None
        self.refresh_sec = (parse_duration(refresh_increment)
                            if refresh_increment else None)
        self._fetch = fetch or self._default_fetch
        self._now = now or time.time
        self._seen_last_refresh: set = set()

    @staticmethod
    def _default_fetch(url: str) -> str:
        if url.startswith(("http://", "https://")):
            from urllib.request import urlopen

            with urlopen(url, timeout=30) as r:
                return r.read().decode("utf-8", errors="replace")
        path = url[len("file://"):] if url.startswith("file://") else url
        with open(path, encoding="utf-8") as f:
            return f.read()

    @staticmethod
    def _item_key(it: dict):
        return (it.get("guid"), it.get("title"), it.get("link"),
                str(it.get("pubDate")))

    def _rows(self, items: List[dict]) -> List[tuple]:
        rows = []
        for it in items:
            if self.use_guid and it.get("guid"):
                doc_id = it["guid"]
            else:
                doc_id = str(uuid.uuid4())
            rows.append((
                doc_id, it.get("author"),
                it["categories"] or None, it.get("comments"),
                it.get("content"), it.get("description"),
                [(e["type"], e["url"], e["length"])
                 for e in it["enclosures"]] or None,
                it.get("guid"), it.get("isPermaLink"), it.get("link"),
                it.get("title"), it.get("pubDate")))
        return rows

    def _refresh_items(self) -> List[dict]:
        items = parse_feed(self._fetch(self.rss_url))
        this_refresh = {self._item_key(it) for it in items}
        cutoff = (self._now() - self.cutoff_sec
                  if self.cutoff_sec is not None else None)
        out = []
        for it in items:
            pd = it.get("pubDate")
            # missing pubDate or no cutoff -> always published (:199-205)
            if cutoff is not None and pd is not None \
                    and pd.timestamp() < cutoff:
                continue
            if self._item_key(it) in self._seen_last_refresh:
                continue
            out.append(it)
        # one bad/empty fetch must not reset the dedupe set (:134-137)
        if this_refresh:
            self._seen_last_refresh = this_refresh
        return out

    def read(self) -> DataFrame:
        """One feed fetch -> DataFrame of fresh items."""
        return self.spark.createDataFrame(
            self._rows(self._refresh_items()), ITEM_SCHEMA)

    def run(self, publish: Callable[[DataFrame], None]) -> int:
        """The execute() loop (RSSConnector.java:94-152): publish fresh
        items, then refresh every refresh_increment until run_duration
        elapses (single pass when not incremental). Returns refresh count."""
        started = self._now()
        n = 0
        while True:
            publish(self.read())
            n += 1
            if self.refresh_sec is None or self.run_sec is None:
                return n
            if self._now() > started + self.run_sec:
                return n
            wake = self._now() + self.refresh_sec
            while self._now() < wake:
                time.sleep(min(0.25, max(self.refresh_sec / 10, 0.01)))
