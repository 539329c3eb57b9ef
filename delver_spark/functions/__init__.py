"""Reusable column-expression function packs (reference worker logic
re-expressed as Catalyst expressions)."""

from .news import (  # noqa: F401
    BLACKLISTED_EXTENSIONS,
    BLACKLISTED_PATHS,
    NEWS_MAX_DEPTH,
    looks_like_article,
    news_url_allowed,
    url_allowed_py,
)
