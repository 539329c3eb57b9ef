"""URL canonicalization, resolution, and domain keys.

Spec (SURVEY.md §1.5, BASELINE.json north_star): RFC-3986 normalize —
scheme + host lowercase, remove default port, resolve dot-segments,
percent-decode unreserved characters (uppercase remaining escapes), empty
path → "/", keep query order, drop fragment.

Domain keys replicate the reference's deliberately naive splits (no public
suffix list): GetSLDAndTLD = last two dot-tokens, GetSLD = second-to-last
token (/root/reference/util/util.go:82-101).

Link resolution replicates util.ResolveUrls (/root/reference/util/util.go:68-80):
RFC 3986 reference resolution against the page URL; unparseable hrefs dropped.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _decode_unreserved(s: str) -> str:
    """Percent-decode unreserved chars; uppercase surviving escapes."""
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n + 1 and i + 3 <= n:
            hx = s[i + 1 : i + 3]
            try:
                ch = chr(int(hx, 16))
            except ValueError:
                out.append(c)
                i += 1
                continue
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + hx.upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1) if inp.startswith("/") else inp.find("/")
            if i == -1:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:i])
                inp = inp[i:]
    return "".join(out)


def canonicalize(url: str) -> str | None:
    """Canonical form used for frontier keys, bloom membership, payload join."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = _decode_unreserved(remove_dot_segments(parts.path)) or "/"
    query = _decode_unreserved(parts.query)
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += "?" + query
    return out


_RESOLVE_BAILOUT = re.compile(r"[\[\]\t\r\n;]")


def resolve(base: str, href: str) -> str | None:
    """RFC 3986 reference resolution; None for unparseable refs.

    Fast path: urljoin is the identity on already-absolute lowercase
    http(s) refs (no merge, no dot-segment removal applies — verified by
    differential fuzz in tests/test_urlnorm.py) and costs ~12 µs/call,
    which dominated the extract loop's resolve stage. Bailouts keep the
    fast path bit-identical to urljoin: brackets (urlsplit raises on
    ']' without '[' too → None), tab/CR/LF (urlsplit strips them,
    bpo-43882), an EMPTY netloc ('http://?x' — urljoin then inherits the
    base authority), empty trailing query/fragment markers ('...?',
    '...#', '...?#' — urlunsplit drops them), and any ';' (urljoin goes
    through urlparse, which drops a trailing empty ;params) all fall
    back to the slow path."""
    if href.startswith("http://"):
        rest = href[7:]
    elif href.startswith("https://"):
        rest = href[8:]
    else:
        rest = ""
    if rest and rest[0] not in "/?#" \
            and rest[-1] not in "?#" and "?#" not in rest \
            and _RESOLVE_BAILOUT.search(href) is None:
        return href
    try:
        return urljoin(base, href)
    except ValueError:
        return None


def host_of(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def path_of(url: str) -> str:
    try:
        return urlsplit(url).path
    except ValueError:
        return ""


def sld_tld(host: str) -> str:
    """GetSLDAndTLD: last two dot-tokens; single token returned as-is."""
    tokens = host.split(".")
    if len(tokens) == 1:
        return host
    return tokens[-2] + "." + tokens[-1]


def sld(host: str) -> str:
    """GetSLD: second-to-last dot-token; single token returned as-is."""
    tokens = host.split(".")
    if len(tokens) == 1:
        return host
    return tokens[-2]
