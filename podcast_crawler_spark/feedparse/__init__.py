"""Pure-Python feed-parse core (no Spark dependency).

Modules: :mod:`xmlscan` (tolerant XML event scanner), :mod:`sanitize`
(ammonia-compatible HTML cleaner), :mod:`scalars` (parse_bool/parse_date/
validate_url), :mod:`rssparse` (the RSS state machine).
"""

from .rssparse import (  # noqa: F401
    FeedParseError,
    ParserConfig,
    extract_text,
    parse_feed,
    parse_feed_result,
)
from .sanitize import clean_html, clean_text  # noqa: F401
from .scalars import parse_bool, parse_date, validate_url  # noqa: F401
