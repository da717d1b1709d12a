"""OAuth2 flows (reference H7, src/oauth2_flow_v2.cpp, oauth2_server.cpp).

Implemented:
- client-credentials grant (the reference's non-interactive path);
- refresh-token grant, with tokens persisted back into the secret
  registry (reference persists into the DuckDB secret,
  oauth2_flow_v2.cpp:198+);
- PKCE helpers (code_verifier/challenge, S256) and the authorization-URL
  builder for the interactive authorization-code flow. The local
  callback server + browser launch of the reference is intentionally
  out of scope for a headless engine — callers supply the redeemed
  ``code`` to ``exchange_code``.
"""

from __future__ import annotations

import base64
import hashlib
import secrets as pysecrets
import time
from dataclasses import dataclass
from urllib.parse import urlencode

from erpl_web_spark.core.http import HttpClient
from erpl_web_spark.core.secrets import Secret, SecretRegistry


def generate_code_verifier(length: int = 64) -> str:
    return base64.urlsafe_b64encode(pysecrets.token_bytes(length)).decode().rstrip("=")[:128]


def code_challenge_s256(verifier: str) -> str:
    digest = hashlib.sha256(verifier.encode()).digest()
    return base64.urlsafe_b64encode(digest).decode().rstrip("=")


def authorization_url(
    authorize_endpoint: str,
    client_id: str,
    redirect_uri: str,
    scope: str = "",
    code_challenge: str | None = None,
    state: str | None = None,
) -> str:
    params = {
        "response_type": "code",
        "client_id": client_id,
        "redirect_uri": redirect_uri,
    }
    if scope:
        params["scope"] = scope
    if code_challenge:
        params["code_challenge"] = code_challenge
        params["code_challenge_method"] = "S256"
    if state:
        params["state"] = state
    return f"{authorize_endpoint}?{urlencode(params)}"


@dataclass
class TokenResponse:
    access_token: str
    refresh_token: str | None
    expires_at: float
    token_type: str = "Bearer"

    @property
    def expired(self) -> bool:
        return time.time() >= self.expires_at - 30  # 30s clock-skew guard


class OAuth2Client:
    def __init__(self, token_endpoint: str, client_id: str,
                 client_secret: str | None = None, http: HttpClient | None = None):
        self.token_endpoint = token_endpoint
        self.client_id = client_id
        self.client_secret = client_secret
        self.http = http or HttpClient()

    def _token_request(self, form: dict[str, str]) -> TokenResponse:
        body = urlencode(form)
        resp = self.http.request(
            "POST", self.token_endpoint, body=body,
            content_type="application/x-www-form-urlencoded",
        )
        if resp.status >= 400:
            raise RuntimeError(
                f"OAuth2 token request failed: HTTP {resp.status}: {resp.text[:200]}"
            )
        doc = resp.json()
        return TokenResponse(
            access_token=doc["access_token"],
            refresh_token=doc.get("refresh_token"),
            expires_at=time.time() + float(doc.get("expires_in", 3600)),
            token_type=doc.get("token_type", "Bearer"),
        )

    def client_credentials(self, scope: str = "") -> TokenResponse:
        form = {"grant_type": "client_credentials", "client_id": self.client_id}
        if self.client_secret:
            form["client_secret"] = self.client_secret
        if scope:
            form["scope"] = scope
        return self._token_request(form)

    def refresh(self, refresh_token: str) -> TokenResponse:
        form = {
            "grant_type": "refresh_token",
            "refresh_token": refresh_token,
            "client_id": self.client_id,
        }
        if self.client_secret:
            form["client_secret"] = self.client_secret
        return self._token_request(form)

    def exchange_code(
        self, code: str, redirect_uri: str, code_verifier: str | None = None
    ) -> TokenResponse:
        form = {
            "grant_type": "authorization_code",
            "code": code,
            "redirect_uri": redirect_uri,
            "client_id": self.client_id,
        }
        if code_verifier:
            form["code_verifier"] = code_verifier
        if self.client_secret:
            form["client_secret"] = self.client_secret
        return self._token_request(form)


def ensure_fresh_token(
    registry: SecretRegistry, secret_name: str, client: OAuth2Client
) -> Secret:
    """Refresh-or-reacquire the token in a secret, persisting it back
    (reference: tokens written back into the secret after refresh)."""
    s = registry.get(secret_name)
    if s is None:
        raise KeyError(f"secret '{secret_name}' not found")
    expires_at = float(s.values.get("expires_at", 0))
    if s.values.get("access_token") and time.time() < expires_at - 30:
        return s
    if s.values.get("refresh_token"):
        tok = client.refresh(s.values["refresh_token"])
    else:
        tok = client.client_credentials(s.values.get("scope", ""))
    values = dict(s.values)
    values.update(
        access_token=tok.access_token,
        refresh_token=tok.refresh_token or s.values.get("refresh_token", ""),
        expires_at=str(tok.expires_at),
    )
    return registry.create_secret(s.name, s.type, s.scope, **values)
