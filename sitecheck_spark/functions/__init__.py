from sitecheck_spark.functions.urls import canonicalize, netloc_of, resolve_link
