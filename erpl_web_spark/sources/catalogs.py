"""ATTACH-style catalog helpers (reference G1-G6): expose remote
collections as Spark temp views.

The reference's ``ATTACH (TYPE ...)`` creates lazily-scanned catalog
tables. Spark-idiomatic equivalent: temp views. Two flavors:
- **lazy** (odata-backed: OData services, Business Central): the view
  wraps the ``odata`` data source, so every query re-scans with pushdown;
- **snapshot** (Graph-backed: SharePoint lists, Excel workbooks): the
  REST payload is fetched once at attach time into a DataFrame view —
  matching the reference's scan-on-bind behavior for these small
  catalogs; re-attach to refresh.

``attach_delta_share`` implements G6, which the reference registers but
leaves unimplemented (README.md:176) — a documented improvement.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from erpl_web_spark.sources.business_central import BusinessCentralClient, bc_read
from erpl_web_spark.sources.delta_share import (
    DeltaShareClient,
    DeltaShareProfile,
    delta_share_scan,
)
from erpl_web_spark.sources.graph import (
    GraphClient,
    graph_excel_table_data,
    graph_excel_tables,
    graph_list_items,
    graph_show_lists,
)


def attach_sharepoint_lists(
    spark: SparkSession, client: GraphClient, site_id: str, name: str
) -> list[str]:
    """One typed snapshot view per SharePoint list (G2, read-only)."""
    views = []
    for row in graph_show_lists(spark, client, site_id).collect():
        df = graph_list_items(spark, client, site_id, row["id"])
        view = f"{name}_{row['name']}"
        df.createOrReplaceTempView(view)
        views.append(view)
    return views


def attach_excel_workbook(
    spark: SparkSession, client: GraphClient, file_id: str, name: str
) -> list[str]:
    """One snapshot view per Excel table (G3); writes go through
    ``excel_table_write`` (B4/B5)."""
    views = []
    for row in graph_excel_tables(spark, client, file_id).collect():
        df = graph_excel_table_data(spark, client, file_id, row["name"])
        view = f"{name}_{row['name']}"
        df.createOrReplaceTempView(view)
        views.append(view)
    return views


def attach_business_central(
    spark: SparkSession,
    client: BusinessCentralClient,
    name: str,
    company_id: str | None = None,
    entities: list[str] | None = None,
) -> list[str]:
    """Lazy odata-backed view per BC entity set (G4)."""
    from erpl_web_spark.odata.client import ODataClient

    model = ODataClient(client.base_url + "/", client.http).get_model()
    views = []
    for set_name in sorted(model.entity_sets):
        if entities is not None and set_name not in entities:
            continue
        df = bc_read(spark, client, set_name, company_id)
        view = f"{name}_{set_name}"
        df.createOrReplaceTempView(view)
        views.append(view)
    return views


def attach_sac(
    spark: SparkSession, base_url: str | None, name: str
) -> list[str]:
    """One lazy planning-data view per discovered SAC model (G5).

    The reference registers the catalog but its model discovery is a stub
    returning empty (sac_catalog.cpp; README.md:560) — so, faithfully,
    this attaches zero views until discovery is implemented; any rows a
    future sac_show_models returns become ``{name}_{model_id}`` views.
    """
    from erpl_web_spark.sources.sac import sac_read_planning_data, sac_show_models

    views = []
    for row in sac_show_models(spark, base_url).collect():
        df = sac_read_planning_data(spark, base_url, row["model_id"])
        view = f"{name}_{row['model_id']}"
        df.createOrReplaceTempView(view)
        views.append(view)
    return views


def attach_delta_share(
    spark: SparkSession, profile: str | DeltaShareProfile, name: str
) -> list[str]:
    """Lazy parquet-backed view per shared table (G6 — implemented here,
    'planned' in the reference)."""
    prof = profile if isinstance(profile, DeltaShareProfile) else DeltaShareProfile.load(profile)
    client = DeltaShareClient(prof)
    views = []
    for share in client.list_shares():
        for schema in client.list_schemas(share):
            for table in client.list_tables(share, schema):
                df = delta_share_scan(spark, prof, share, schema, table)
                view = f"{name}_{share}_{schema}_{table}"
                df.createOrReplaceTempView(view)
                views.append(view)
    return views
