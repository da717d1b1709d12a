from erpl_web_spark.core.secrets import SecretRegistry


def test_longest_prefix_scope_match():
    reg = SecretRegistry()
    reg.create_secret("broad", "http_bearer", scope="https://h/", token="broad-tok")
    reg.create_secret("narrow", "http_bearer", scope="https://h/svc/", token="narrow-tok")
    s = reg.lookup_for_url("https://h/svc/People")
    assert s.name == "narrow"
    assert reg.lookup_for_url("https://h/other").name == "broad"
    assert reg.lookup_for_url("https://elsewhere/") is None


def test_scope_match_requires_component_boundary():
    """Scope 'https://host.com' must not leak auth to
    'https://host.com.evil.net/...' — the prefix has to end at a URL
    component boundary."""
    reg = SecretRegistry()
    reg.create_secret("h", "http_bearer", scope="https://host.com", token="t")
    assert reg.lookup_for_url("https://host.com").name == "h"
    assert reg.lookup_for_url("https://host.com/api").name == "h"
    assert reg.lookup_for_url("https://host.com?x=1").name == "h"
    assert reg.lookup_for_url("https://host.com.evil.net/x") is None
    reg.create_secret("p", "http_bearer", scope="https://h/api", token="t2")
    assert reg.lookup_for_url("https://h/apiv2/x") is None
    assert reg.lookup_for_url("https://h/api/v2").name == "p"


def test_basic_auth_header():
    reg = SecretRegistry()
    reg.create_secret("b", "http_basic", scope="http://h/", username="u", password="p")
    hdrs = reg.auth_headers_for_url("http://h/x")
    assert hdrs["Authorization"].startswith("Basic ")
    import base64

    assert base64.b64decode(hdrs["Authorization"][6:]).decode() == "u:p"


def test_bearer_and_graph_types():
    reg = SecretRegistry()
    reg.create_secret("t", "http_bearer", scope="http://h/", token="tok123")
    assert reg.auth_headers_for_url("http://h/x") == {"Authorization": "Bearer tok123"}
    reg2 = SecretRegistry()
    reg2.create_secret("g", "microsoft_graph", scope="https://graph/", access_token="gt")
    assert reg2.auth_headers_for_url("https://graph/v1.0/me") == {
        "Authorization": "Bearer gt"
    }
