"""URL normalization + registrable-domain extraction.

Same observable behavior as the reference's normalizers
(/root/reference/app/crawler/normalization.py:17-58): lowercase scheme/host,
default https, collapse slash runs, drop tracking params and fragments; eTLD+1
with a small multipart-suffix set.  Used by the reference-graph edge extractor
(SURVEY.md §2.2 M2/M3).
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

TRACKING_PARAMS = frozenset({
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid",
})

_SLASH_RUN = re.compile(r"/+")


def normalize_url(raw_url: str) -> str:
    parts = urlsplit(raw_url.strip())
    scheme = parts.scheme.lower() or "https"
    netloc = parts.netloc.lower()
    if not netloc and parts.path:
        netloc = parts.path.lower()
        path = ""
    else:
        path = parts.path or "/"
    path = _SLASH_RUN.sub("/", path)
    kept = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=False)
            if k.lower() not in TRACKING_PARAMS]
    return urlunsplit((scheme, netloc, path, urlencode(kept), ""))


_MULTIPART_SUFFIXES = frozenset({
    ("co", "uk"), ("org", "uk"), ("ac", "uk"), ("gov", "uk"),
    ("com", "au"), ("net", "au"), ("org", "au"), ("co", "jp"),
})


def registrable_domain(raw_url: str) -> str:
    host = urlsplit(raw_url.strip()).hostname or ""
    host = host.lower().strip(".")
    if not host:
        return ""
    labels = [l for l in host.split(".") if l]
    if len(labels) <= 2:
        return host
    if (labels[-2], labels[-1]) in _MULTIPART_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])
