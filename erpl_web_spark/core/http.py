"""HTTP client with the reference's operational semantics.

Contract (see BASELINE.md and reference src/http_client.cpp):
- retry with exponential backoff: 3 retries, 100 ms initial wait, 4x
  backoff, on statuses 408/418/429/503/504 (http_client.hpp:90-97,
  http_client.cpp:1009-1050);
- manual redirect handling: <=10 hops, same-origin keeps auth headers,
  cross-origin strips Authorization/Cookie, 301/302/303 -> GET, 307/308
  preserve method+body (http_client.cpp:946-1000);
- charset conversion utf-8 / iso-8859-1 / iso-8859-15 / windows-1252
  auto-detected from Content-Type (charset_converter.cpp:9-90);
- binary content tagged with a BINARY_CONTENT_BASE64: prefix for
  octet-stream/pdf/image/video/audio/font (http_client.cpp:875-900);
- optional response cache keyed on (method, url) (http_client.hpp:291-330).

Connection reuse comes from a per-client requests.Session (keep-alive),
matching the reference's per-host client reuse. One HttpClient per
executor task is the intended usage pattern.
"""

from __future__ import annotations

import base64
import time
from dataclasses import dataclass, field

import requests

from erpl_web_spark.core.url import HttpUrl

RETRY_STATUSES = {408, 418, 429, 503, 504}
BINARY_PREFIX = "BINARY_CONTENT_BASE64:"
_BINARY_TYPES = (
    "application/octet-stream", "application/pdf", "image/", "video/",
    "audio/", "font/",
)
_SENSITIVE_HEADERS = {"authorization", "cookie", "proxy-authorization", "www-authenticate"}
_KNOWN_CHARSETS = {"utf-8", "iso-8859-1", "iso-8859-15", "windows-1252"}

# Magic-byte signatures (reference pattern_matcher.cpp:11-50): used when
# the server sends no usable Content-Type — content wins over headers.
_MAGIC_SIGNATURES = (
    b"\xff\xd8\xff",            # JPEG
    b"\x89PNG",                 # PNG
    b"GIF8",                    # GIF
    b"BM",                      # BMP
    b"RIFF",                    # WebP/WAV/AVI
    b"PK\x03\x04",              # ZIP / Office Open XML
    b"\x1f\x8b",                # GZIP
    b"\x28\xb5\x2f\xfd",        # Zstd
    b"Rar!",                    # RAR
    b"7z\xbc\xaf\x27\x1c",      # 7z
    b"%PDF",                    # PDF
    b"\xd0\xcf\x11\xe0",        # MS Office 97-2003
    b"\xff\xfb", b"\xff\xfa",   # MP3
    b"ID3",                     # MP3 with ID3 tag
    b"\x1a\x45\xdf\xa3",        # WebM/Matroska
    b"OggS",                    # Ogg
    b"fLaC",                    # FLAC
    b"\x7fELF",                 # ELF
    b"PAR1",                    # Parquet
)


def sniff_binary(raw: bytes) -> bool:
    """Magic-byte + NUL heuristic for untyped payloads (reference
    PatternMatcher::IsBinaryContent / MatchesBinarySignature)."""
    if not raw:
        return False
    if any(raw.startswith(m) for m in _MAGIC_SIGNATURES):
        return True
    if raw[4:8] == b"ftyp":        # MP4/MOV: signature at offset 4
        return True
    if raw[257:262] == b"ustar":   # TAR: signature at offset 257
        return True
    return b"\x00" in raw[:1024]   # NUL in the head: not text


@dataclass
class RetryConfig:
    retries: int = 3
    wait_ms: int = 100
    backoff: float = 4.0
    timeout_s: float = 30.0
    max_redirects: int = 10
    # A read timeout means the request MAY have been delivered and
    # processed — retrying a non-idempotent method (POST mutation, OAuth
    # code exchange) can double-execute it. Timeouts therefore retry only
    # for idempotent methods unless the caller opts in.
    retry_non_idempotent: bool = False


_IDEMPOTENT_METHODS = {"GET", "HEAD", "OPTIONS"}


@dataclass
class HttpResponse:
    method: str
    status: int
    url: str
    headers: dict[str, str]
    content_type: str
    raw: bytes

    @property
    def text(self) -> str:
        """Decoded text content with reference charset + binary handling."""
        charset = "utf-8"
        ct = self.content_type.lower()
        if "charset=" in ct:
            cand = ct.split("charset=", 1)[1].split(";")[0].strip().strip('"')
            if cand in _KNOWN_CHARSETS:
                charset = cand
        if any(ct.startswith(b) for b in _BINARY_TYPES):
            return BINARY_PREFIX + base64.b64encode(self.raw).decode("ascii")
        if not ct and sniff_binary(self.raw):
            # No Content-Type at all: sniff magic bytes so a PNG from a
            # header-less server doesn't get mojibake'd into "text".
            return BINARY_PREFIX + base64.b64encode(self.raw).decode("ascii")
        return self.raw.decode(charset, errors="replace")

    def json(self):
        import json

        return json.loads(self.text)


class HttpClient:
    def __init__(
        self,
        retry: RetryConfig | None = None,
        auth_headers: dict[str, str] | None = None,
        cache_responses: bool = False,
        session: requests.Session | None = None,
    ):
        self.retry = retry or RetryConfig()
        self.auth_headers = dict(auth_headers or {})
        self.cache_responses = cache_responses
        self._cache: dict[tuple[str, str], HttpResponse] = {}
        self._session = session or requests.Session()

    # -- public verbs ------------------------------------------------------

    def get(self, url: str, headers: dict[str, str] | None = None) -> HttpResponse:
        return self.request("GET", url, headers=headers)

    def head(self, url: str, headers: dict[str, str] | None = None) -> HttpResponse:
        return self.request("HEAD", url, headers=headers)

    def request(
        self,
        method: str,
        url: str,
        headers: dict[str, str] | None = None,
        body: bytes | str | None = None,
        content_type: str | None = None,
    ) -> HttpResponse:
        key = (method, url)
        if self.cache_responses and method in ("GET", "HEAD") and key in self._cache:
            return self._cache[key]
        resp = self._request_with_redirects(method, url, headers or {}, body, content_type)
        if self.cache_responses and method in ("GET", "HEAD"):
            self._cache[key] = resp
        return resp

    def clear_cache(self) -> None:
        self._cache.clear()

    # -- internals ---------------------------------------------------------

    def _request_with_redirects(self, method, url, headers, body, content_type):
        current_method = method
        current_url = url
        current_body = body
        send_auth = True
        origin = HttpUrl.parse(url)
        for _hop in range(self.retry.max_redirects + 1):
            resp = self._request_with_retries(
                current_method, current_url, headers, current_body, content_type, send_auth
            )
            if resp.status in (301, 302, 303, 307, 308):
                location = resp.headers.get("Location") or resp.headers.get("location")
                if not location:
                    return resp
                target = HttpUrl.parse(current_url).resolve(location)
                # Cross-origin redirects must not leak credentials.
                send_auth = origin.equivalent_origin(target)
                if resp.status in (301, 302, 303) and current_method not in ("GET", "HEAD"):
                    current_method, current_body = "GET", None
                current_url = target.to_string()
                continue
            return resp
        raise RuntimeError(f"redirect limit ({self.retry.max_redirects}) exceeded for {url}")

    def _request_with_retries(self, method, url, headers, body, content_type, send_auth):
        hdrs = dict(headers)
        if send_auth:
            hdrs.update(self.auth_headers)
        else:
            hdrs = {k: v for k, v in hdrs.items() if k.lower() not in _SENSITIVE_HEADERS}
        if content_type:
            hdrs["Content-Type"] = content_type

        attempt = 0
        while True:
            attempt += 1
            try:
                r = self._session.request(
                    method,
                    url,
                    headers=hdrs,
                    data=body,
                    timeout=self.retry.timeout_s,
                    allow_redirects=False,
                )
                status = r.status_code
            except requests.ConnectTimeout:
                # The connection never opened — nothing was delivered, so
                # every method is safe to retry with the backoff ladder.
                if attempt > self.retry.retries:
                    raise
                self._sleep(attempt)
                continue
            except (requests.ConnectionError, requests.Timeout):
                # A read timeout (or mid-flight connection drop) means the
                # server may already have processed the request; retrying
                # a mutation would duplicate its side effects. Retry only
                # idempotent methods (reference timeout_http_client.cpp
                # wraps requests in a deadline for the hung-server case),
                # unless the caller opted in via retry_non_idempotent.
                retryable = (
                    method.upper() in _IDEMPOTENT_METHODS
                    or self.retry.retry_non_idempotent
                )
                if not retryable or attempt > self.retry.retries:
                    raise
                self._sleep(attempt)
                continue
            if status in RETRY_STATUSES and attempt <= self.retry.retries:
                self._sleep(attempt)
                continue
            return HttpResponse(
                method=method,
                status=status,
                url=url,
                headers={k: v for k, v in r.headers.items()},
                content_type=r.headers.get("Content-Type", ""),
                raw=r.content if method != "HEAD" else b"",
            )

    def _sleep(self, attempt: int) -> None:
        # wait * backoff^(attempt-1): 100ms, 400ms, 1600ms (reference
        # formula http_client.cpp:1046-1050).
        time.sleep(self.retry.wait_ms / 1000.0 * (self.retry.backoff ** (attempt - 1)))
