"""Secret registry with URL-scope matching.

Mirrors the reference's CREATE SECRET + URL-scoped lookup semantics
(reference: src/secret_functions.cpp; scope matching
src/http_client.cpp:351-387): a secret carries an explicit scope (list of
URL prefixes); lookup picks the secret with the longest matching prefix.
Supported types map to HTTP auth headers: http_basic (user/password),
http_bearer (token). OAuth2-backed types (microsoft_graph, datasphere,
...) plug in by storing/refreshing a bearer token.
"""

from __future__ import annotations

import base64
import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class Secret:
    name: str
    type: str  # http_basic | http_bearer | ...
    scope: list[str] = field(default_factory=list)
    values: dict[str, str] = field(default_factory=dict)

    def auth_headers(self) -> dict[str, str]:
        if self.type == "http_basic":
            cred = f"{self.values.get('username', '')}:{self.values.get('password', '')}"
            return {"Authorization": "Basic " + base64.b64encode(cred.encode()).decode()}
        if self.type == "http_bearer":
            return {"Authorization": f"Bearer {self.values.get('token', '')}"}
        if self.type in ("microsoft_graph", "microsoft_entra", "business_central",
                         "dataverse", "datasphere", "sac"):
            tok = self.values.get("access_token") or self.values.get("token", "")
            return {"Authorization": f"Bearer {tok}"}
        return {}


def _scope_matches(url: str, prefix: str) -> bool:
    """True when ``prefix`` matches ``url`` up to a URL component
    boundary — the char after the prefix must be '/', '?', '#' or
    end-of-string (or the prefix itself ends with '/')."""
    if not url.startswith(prefix):
        return False
    if len(url) == len(prefix) or prefix.endswith("/"):
        return True
    return url[len(prefix)] in "/?#"


class SecretRegistry:
    """In-memory registry, optionally file-backed.

    The file backing matters for Spark: a Python Data Source's
    ``schema()``/``reader()``/``read()`` run in separate Python worker
    processes, so driver-process memory is invisible there. A registry
    persisted at ``persist_path`` (default ``$ERPL_WEB_SECRETS_FILE`` or
    ``~/.erpl_web_spark/secrets.json``, mode 0600) is re-read lazily by
    whichever process needs it — the Spark-world analogue of the
    reference's engine-persisted CREATE SECRET storage. On a multi-node
    cluster, ship the file to the same path on executors (or use inline
    auth options on the read).
    """

    def __init__(self, persist_path: str | None = None) -> None:
        self._secrets: dict[str, Secret] = {}
        self._persist_path = os.path.expanduser(persist_path) if persist_path else None
        self._loaded_mtime: float | None = None

    # -- persistence -------------------------------------------------------

    def _refresh(self) -> None:
        if not self._persist_path or not os.path.exists(self._persist_path):
            return
        mtime = os.path.getmtime(self._persist_path)
        if self._loaded_mtime == mtime:
            return
        try:
            with open(self._persist_path) as f:
                raw = json.load(f)
            self._secrets = {
                name: Secret(**entry) for name, entry in raw.items()
            }
            self._loaded_mtime = mtime
        except (json.JSONDecodeError, OSError, TypeError):
            pass  # unreadable store -> keep in-memory view

    def _flush(self) -> None:
        if not self._persist_path:
            return
        os.makedirs(os.path.dirname(self._persist_path), exist_ok=True)
        tmp = self._persist_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({n: asdict(s) for n, s in self._secrets.items()}, f)
        os.chmod(tmp, 0o600)
        os.replace(tmp, self._persist_path)
        self._loaded_mtime = os.path.getmtime(self._persist_path)

    # -- CRUD --------------------------------------------------------------

    def create_secret(
        self, name: str, type: str, scope: list[str] | str | None = None, **values: str
    ) -> Secret:
        self._refresh()
        if isinstance(scope, str):
            scope = [scope]
        s = Secret(name=name, type=type, scope=scope or [], values=values)
        self._secrets[name] = s
        self._flush()
        return s

    def drop_secret(self, name: str) -> None:
        self._refresh()
        self._secrets.pop(name, None)
        self._flush()

    def get(self, name: str) -> Secret | None:
        self._refresh()
        return self._secrets.get(name)

    def lookup_for_url(self, url: str, type: str | None = None) -> Secret | None:
        """Longest-prefix scope match (reference http_client.cpp:351-387).

        The prefix must end at a URL component boundary: scope
        'https://host.com' must NOT match 'https://host.com.evil.net/x'
        (auth headers would leak to an unrelated host)."""
        self._refresh()
        best: Secret | None = None
        best_len = -1
        for s in self._secrets.values():
            if type is not None and s.type != type:
                continue
            for prefix in s.scope:
                if _scope_matches(url, prefix) and len(prefix) > best_len:
                    best, best_len = s, len(prefix)
        return best

    def auth_headers_for_url(self, url: str) -> dict[str, str]:
        s = self.lookup_for_url(url)
        return s.auth_headers() if s else {}


default_registry = SecretRegistry(
    persist_path=os.environ.get(
        "ERPL_WEB_SECRETS_FILE", os.path.join("~", ".erpl_web_spark", "secrets.json")
    )
)


def auth_headers_from_options(options) -> dict[str, str]:
    """Resolve connector auth from read options, shared by the
    OData/GraphQL/REST data sources: inline ``auth_type``/``token``/
    ``username``+``password`` first (work on any cluster topology), then
    the file-backed registry — by ``secret`` name, else by URL-scope
    longest-prefix match."""
    auth_type = options.get("auth_type")
    if auth_type == "bearer" or "token" in options:
        return {"Authorization": f"Bearer {options.get('token', '')}"}
    if auth_type == "basic" or "username" in options:
        cred = f"{options.get('username', '')}:{options.get('password', '')}"
        return {"Authorization": "Basic " + base64.b64encode(cred.encode()).decode()}
    secret_name = options.get("secret")
    if secret_name:
        s = default_registry.get(secret_name)
        if s is not None:
            return s.auth_headers()
    return default_registry.auth_headers_for_url(options.get("url", ""))
