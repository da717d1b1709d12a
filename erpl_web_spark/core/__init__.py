"""Core plumbing: URL building, HTTP session (retry/redirect/charset/
cache), secret registry. Pure Python, no Spark dependency — usable on the
driver (probe/metadata) and inside executors (page fetches)."""

from erpl_web_spark.core.url import HttpUrl, merge_query_params, canonicalize_query_key
from erpl_web_spark.core.http import HttpClient, HttpResponse, RetryConfig
from erpl_web_spark.core.secrets import SecretRegistry, Secret, default_registry

__all__ = [
    "HttpUrl",
    "merge_query_params",
    "canonicalize_query_key",
    "HttpClient",
    "HttpResponse",
    "RetryConfig",
    "SecretRegistry",
    "Secret",
    "default_registry",
]
