from erpl_web_spark.core.http import BINARY_PREFIX, HttpClient, RetryConfig


def client(**kw):
    return HttpClient(retry=RetryConfig(wait_ms=10), **kw)


def test_retry_on_429_then_success(fixture_server):
    c = client()
    resp = c.get(fixture_server.base_url + "/http/flaky")
    assert resp.status == 200
    assert resp.json()["attempts"] == 3  # two 429s then success


def test_read_timeout_is_retried(fixture_server):
    """A hung response must hit the same backoff ladder as a connection
    failure: requests.ReadTimeout is not a ConnectionError subclass, so
    without the explicit catch the first slow response would kill the
    scan (reference timeout_http_client.cpp deadlines every request)."""
    from erpl_web_spark.core.http import HttpClient, RetryConfig

    c = HttpClient(retry=RetryConfig(wait_ms=10, timeout_s=0.5, retries=2))
    resp = c.get(fixture_server.base_url + "/http/slow-once")
    assert resp.status == 200
    assert resp.json()["attempts"] == 2  # first timed out, second served


def test_post_read_timeout_not_retried(fixture_server):
    """A read timeout on a POST may mean the server already processed the
    mutation — retrying would duplicate side effects (bulk graphql_call
    mutations, OAuth one-time code exchange). Default: raise instead."""
    import pytest
    import requests

    c = HttpClient(retry=RetryConfig(wait_ms=10, timeout_s=0.5, retries=2))
    with pytest.raises(requests.Timeout):
        c.request(
            "POST",
            fixture_server.base_url + "/http/slow-once-post/default",
            body=b"{}",
            content_type="application/json",
        )


def test_post_read_timeout_retried_with_opt_in(fixture_server):
    c = HttpClient(
        retry=RetryConfig(wait_ms=10, timeout_s=0.5, retries=2, retry_non_idempotent=True)
    )
    resp = c.request(
        "POST",
        fixture_server.base_url + "/http/slow-once-post/optin",
        body=b"{}",
        content_type="application/json",
    )
    assert resp.status == 200
    assert resp.json()["attempts"] == 2


def test_redirect_chain_followed(fixture_server):
    c = client()
    resp = c.get(fixture_server.base_url + "/http/redirect/3")
    assert resp.status == 200
    assert resp.json()["path"] == "/http/echo"


def test_redirect_limit(fixture_server):
    c = HttpClient(retry=RetryConfig(wait_ms=10, max_redirects=2))
    try:
        c.get(fixture_server.base_url + "/http/redirect/5")
        assert False, "expected redirect-limit error"
    except RuntimeError as e:
        assert "redirect limit" in str(e)


def test_cross_origin_redirect_strips_auth(fixture_server):
    # Request via localhost; server redirects to 127.0.0.1 -> different
    # origin by hostname -> Authorization must be stripped.
    port = fixture_server.base_url.rsplit(":", 1)[1]
    c = client(auth_headers={"Authorization": "Bearer secret"})
    resp = c.get(f"http://localhost:{port}/http/redirect-cross")
    assert resp.status == 200
    headers = resp.json()["headers"]
    assert "Authorization" not in headers


def test_same_origin_redirect_keeps_auth(fixture_server):
    c = client(auth_headers={"Authorization": "Bearer secret"})
    resp = c.get(fixture_server.base_url + "/http/redirect/1")
    assert resp.json()["headers"].get("Authorization") == "Bearer secret"


def test_charset_iso_8859_1(fixture_server):
    resp = client().get(fixture_server.base_url + "/http/latin1")
    assert resp.text == "Grüße, café"


def test_binary_content_base64_prefix(fixture_server):
    resp = client().get(fixture_server.base_url + "/http/binary")
    assert resp.text.startswith(BINARY_PREFIX)
    import base64

    raw = base64.b64decode(resp.text[len(BINARY_PREFIX):])
    assert raw.startswith(b"\x89PNG")


def test_response_cache(fixture_server):
    c = client(cache_responses=True)
    url = fixture_server.base_url + "/http/echo?x=1"
    before = len(fixture_server.state.requests_for("/http/echo"))
    c.get(url)
    c.get(url)
    after = len(fixture_server.state.requests_for("/http/echo"))
    assert after == before + 1  # second hit served from cache


def test_post_roundtrip(fixture_server):
    resp = client().request(
        "POST", fixture_server.base_url + "/http/echo",
        body='{"a": 1}', content_type="application/json",
    )
    assert resp.status == 201
    assert resp.json()["received"] == '{"a": 1}'


def test_untyped_binary_sniffed_by_magic_bytes():
    """No Content-Type + magic bytes => base64 tag, not mojibake
    (reference pattern_matcher.cpp signatures; content wins over absent
    headers). Typed text with high bytes must NOT be sniffed."""
    from erpl_web_spark.core.http import HttpResponse, sniff_binary

    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    r = HttpResponse("GET", 200, "http://h/x", {}, "", png)
    assert r.text.startswith(BINARY_PREFIX)
    # declared text stays text even with odd bytes
    r2 = HttpResponse("GET", 200, "http://h/x", {}, "text/plain", b"Gr\xfc\xdfe")
    assert not r2.text.startswith(BINARY_PREFIX)
    assert sniff_binary(b"PAR1" + b"x" * 8)        # parquet
    assert sniff_binary(b"\x00" * 8)               # NUL head
    assert sniff_binary(b"\x00\x00\x00 ftypisom")  # MP4 at offset 4
    assert not sniff_binary(b'{"plain": "json without header"}')
    assert not sniff_binary(b"")
