"""URL parsing / merging / query-parameter handling.

Behavioral contract follows the reference's HttpUrl + query-param
merge/sanitize layer (reference: src/http_client.cpp:122-335 URL
parse/merge/relative resolution; src/odata_predicate_pushdown_helper.cpp:
126-410 param merge, 184-199 '%24'-encoded key canonicalization,
355-394 dedup / never-overwrite rules).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import parse_qsl, quote, urlencode, urljoin, urlsplit, urlunsplit


def canonicalize_query_key(key: str) -> str:
    """'%24select' and '$select' are the same OData option — canonicalize
    percent-encoded '$' prefixes (reference helper: CanonicalizeQueryKey)."""
    if key.lower().startswith("%24"):
        return "$" + key[3:]
    return key


@dataclass
class HttpUrl:
    scheme: str = "http"
    host: str = ""
    port: int | None = None
    path: str = "/"
    query: str = ""
    fragment: str = ""
    username: str = ""
    password: str = ""

    @classmethod
    def parse(cls, url: str) -> "HttpUrl":
        parts = urlsplit(url)
        return cls(
            scheme=parts.scheme or "http",
            host=parts.hostname or "",
            port=parts.port,
            path=parts.path or "/",
            query=parts.query,
            fragment=parts.fragment,
            username=parts.username or "",
            password=parts.password or "",
        )

    @property
    def origin(self) -> str:
        netloc = self.host if self.port is None else f"{self.host}:{self.port}"
        return f"{self.scheme}://{netloc}"

    def equivalent_origin(self, other: "HttpUrl") -> bool:
        """Same-origin check used for auth-header propagation on redirects
        (reference: http_client.cpp:961-975)."""
        def eff_port(u: HttpUrl) -> int:
            if u.port is not None:
                return u.port
            return 443 if u.scheme == "https" else 80

        return (
            self.scheme == other.scheme
            and self.host.lower() == other.host.lower()
            and eff_port(self) == eff_port(other)
        )

    def resolve(self, maybe_relative: str) -> "HttpUrl":
        """Merge a possibly-relative URL against this base (next-page links
        may be relative; reference: odata_client.cpp:160-188)."""
        return HttpUrl.parse(urljoin(self.to_string(), maybe_relative))

    def query_params(self) -> dict[str, str]:
        return {
            canonicalize_query_key(k): v
            for k, v in parse_qsl(self.query, keep_blank_values=True)
        }

    def with_query_params(self, params: dict[str, str]) -> "HttpUrl":
        q = urlencode(params, quote_via=quote, safe="$',()*: ").replace(" ", "%20")
        return HttpUrl(
            self.scheme, self.host, self.port, self.path, q, self.fragment,
            self.username, self.password,
        )

    def to_string(self) -> str:
        netloc = self.host if self.port is None else f"{self.host}:{self.port}"
        if self.username:
            cred = self.username + (f":{self.password}" if self.password else "")
            netloc = f"{cred}@{netloc}"
        return urlunsplit((self.scheme, netloc, self.path, self.query, self.fragment))

    def __str__(self) -> str:  # pragma: no cover
        return self.to_string()


def merge_query_params(
    existing: dict[str, str],
    generated: dict[str, str],
    never_overwrite: tuple[str, ...] = ("$filter",),
) -> dict[str, str]:
    """Merge generated OData clauses into user-supplied URL params.

    Reference rules (odata_predicate_pushdown_helper.cpp:355-394):
    user-provided values win for keys in ``never_overwrite`` (guards
    against double-encoding a user's $filter); otherwise generated values
    replace user ones; key set is deduplicated via canonicalization.
    """
    out: dict[str, str] = {canonicalize_query_key(k): v for k, v in existing.items()}
    for k, v in generated.items():
        k = canonicalize_query_key(k)
        if k in out and k in never_overwrite:
            continue
        out[k] = v
    return out
