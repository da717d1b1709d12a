"""``attach_odata`` — expose every entity set of a service as temp views.

Reference (G1, SURVEY.md §3.2): ``ATTACH '<url>' AS db (TYPE odata)``
creates one lazily-scanned table per entity set, each reusing the same
scan machinery. Spark-idiomatic slice: one temp view per entity set
backed by the ``odata`` data source — queries hit the connector with full
pushdown; nothing is fetched at attach time beyond the service document
and EDMX.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from erpl_web_spark.core.http import HttpClient
from erpl_web_spark.core.secrets import default_registry
from erpl_web_spark.odata.client import ODataClient
from erpl_web_spark.odata.datasource import ensure_registered


def attach_odata(
    spark: SparkSession,
    url: str,
    name: str,
    entity_sets: list[str] | None = None,
) -> list[str]:
    """Register ``{name}_{entity_set}`` temp views; returns view names."""
    ensure_registered(spark)
    client = ODataClient(
        url, HttpClient(auth_headers=default_registry.auth_headers_for_url(url))
    )
    model = client.get_model()
    base = url.rstrip("/")
    views: list[str] = []
    for set_name in sorted(model.entity_sets):
        if entity_sets is not None and set_name not in entity_sets:
            continue
        df = (
            spark.read.format("odata")
            .option("url", f"{base}/{set_name}")
            .load()
        )
        view = f"{name}_{set_name}"
        df.createOrReplaceTempView(view)
        views.append(view)
    return views


def detach_odata(spark: SparkSession, name: str, views: list[str]) -> None:
    for v in views:
        spark.catalog.dropTempView(v)
