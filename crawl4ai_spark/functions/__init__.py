from crawl4ai_spark.functions.urlnorm import (  # noqa: F401
    canonicalize_for_frontier,
    canonicalize_full,
    get_base_domain,
    is_external_url,
    is_valid_crawl_url,
    udf_canonicalize,
    udf_base_domain,
)
from crawl4ai_spark.functions.fingerprint import url_fingerprint, content_fingerprint  # noqa: F401
