"""Auth propagation into the data source — including the subtlety that
DataSource.schema()/read() run in separate Python worker processes, so
secrets must reach them via the file-backed registry or inline options."""

import os


def test_file_backed_secret_reaches_worker(spark, fixture_server, secrets_file):
    from erpl_web_spark.core.secrets import SecretRegistry
    from erpl_web_spark.odata.datasource import ODataDataSource

    spark.dataSource.register(ODataDataSource)
    # Write through a registry bound to the same file the workers will read
    # (the env var was set in conftest before the SparkSession started).
    reg = SecretRegistry(persist_path=secrets_file)
    reg.create_secret("fx", "http_bearer", scope=fixture_server.base_url, token="tok-xyz")

    fixture_server.state.log.clear()
    (
        spark.read.format("odata")
        .option("url", fixture_server.base_url + "/v4/Orders")
        .load()
        .count()
    )
    auths = {r["headers"].get("Authorization") for r in fixture_server.state.log}
    assert auths == {"Bearer tok-xyz"}


def test_inline_auth_options(spark, fixture_server):
    from erpl_web_spark.odata.datasource import ODataDataSource

    spark.dataSource.register(ODataDataSource)
    fixture_server.state.log.clear()
    (
        spark.read.format("odata")
        .option("url", fixture_server.base_url + "/v4/Orders")
        .option("auth_type", "basic")
        .option("username", "u")
        .option("password", "p")
        .load()
        .count()
    )
    import base64

    expected = "Basic " + base64.b64encode(b"u:p").decode()
    auths = {r["headers"].get("Authorization") for r in fixture_server.state.log}
    assert auths == {expected}


def test_secret_file_mode_is_private(tmp_path):
    from erpl_web_spark.core.secrets import SecretRegistry

    path = str(tmp_path / "s.json")
    reg = SecretRegistry(persist_path=path)
    reg.create_secret("a", "http_bearer", scope="http://h/", token="t")
    assert oct(os.stat(path).st_mode & 0o777) == "0o600"
    # A fresh registry instance (≈ another process) sees the secret.
    reg2 = SecretRegistry(persist_path=path)
    assert reg2.get("a").values["token"] == "t"
