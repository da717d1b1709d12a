"""OData v2/v4 connector core: EDMX -> StructType, JSON row decoding,
predicate pushdown translation, URL building, pagination, and the
Python Data Source exposing it all as ``spark.read.format("odata")``."""

from erpl_web_spark.odata.edm import EdmModel, edm_primitive_to_spark
from erpl_web_spark.odata.filters import translate_filters
from erpl_web_spark.odata.query_builder import ODataQueryBuilder
from erpl_web_spark.odata.json_decode import decode_rows, decode_value
from erpl_web_spark.odata.client import ODataClient, detect_version

__all__ = [
    "EdmModel",
    "edm_primitive_to_spark",
    "translate_filters",
    "ODataQueryBuilder",
    "decode_rows",
    "decode_value",
    "ODataClient",
    "detect_version",
]
