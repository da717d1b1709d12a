from erpl_web_spark.core.url import HttpUrl, canonicalize_query_key, merge_query_params


def test_parse_roundtrip():
    u = HttpUrl.parse("https://host.example:8443/svc/People?$top=5#frag")
    assert u.scheme == "https"
    assert u.host == "host.example"
    assert u.port == 8443
    assert u.path == "/svc/People"
    assert u.query == "$top=5"
    assert "host.example:8443/svc/People" in u.to_string()


def test_origin_equivalence_default_ports():
    a = HttpUrl.parse("https://h/x")
    b = HttpUrl.parse("https://h:443/y")
    assert a.equivalent_origin(b)
    assert not a.equivalent_origin(HttpUrl.parse("http://h/x"))
    assert not a.equivalent_origin(HttpUrl.parse("https://other/x"))


def test_resolve_relative_and_absolute():
    base = HttpUrl.parse("https://h/svc/People?$skip=3")
    assert base.resolve("Orders").to_string() == "https://h/svc/Orders"
    assert base.resolve("/other/path").to_string() == "https://h/other/path"
    assert base.resolve("https://x/y").to_string() == "https://x/y"


def test_canonicalize_percent24():
    assert canonicalize_query_key("%24select") == "$select"
    assert canonicalize_query_key("%24FILTER") == "$FILTER"
    assert canonicalize_query_key("$top") == "$top"
    assert canonicalize_query_key("plain") == "plain"


def test_merge_never_overwrites_user_filter():
    user = {"%24filter": "Name eq 'x'", "custom": "1"}
    gen = {"$filter": "Age gt 5", "$top": "10"}
    merged = merge_query_params(user, gen)
    assert merged["$filter"] == "Name eq 'x'"  # user wins
    assert merged["$top"] == "10"
    assert merged["custom"] == "1"


def test_merge_generated_wins_elsewhere():
    merged = merge_query_params({"$top": "5"}, {"$top": "10"})
    assert merged["$top"] == "10"


def test_query_params_encoding_roundtrip():
    u = HttpUrl.parse("http://h/svc/People")
    out = u.with_query_params({"$filter": "Name eq 'O''Brien'", "$top": "5"})
    p = out.query_params()
    assert p["$filter"] == "Name eq 'O''Brien'"
    assert p["$top"] == "5"
