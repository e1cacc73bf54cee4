"""URL-classification predicates (SURVEY C5, C12, C13).

Native Column expressions only — these run in the frontier scheduling path
where a Python UDF would break whole-stage codegen. The regex constants are
the single source of truth: the DuckDB oracle SQL in __spark_entry__ is
generated from them.

Reference semantics:
- non-HTML extension filter (C5): reject asset extensions
  (reference scrapers/utils.py:106-117; 18 extensions — representative
  subset here, the graft treats image URLs as payload so this is a
  *classification*, not a drop)
- blog-post heuristic (C12): hyphenated slug >5 chars or a 4-digit year in
  the path; /tags//category//page/ always lose
  (reference scrapers/blog_scraper.py:145-163)
- listing-page heuristic (C13): path contains /page/ /tags/ /category/
  /archive (reference scrapers/blog_scraper.py:165-173)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ASSET_EXT_RX = r"\.(pdf|png|jpg|jpeg|gif|svg|css|js|ico|zip|gz|mp4|webm)$"
LISTING_RX = r"/(page|tags|category|archive)(/|$)"
POST_SLUG_RX = r"/[a-z0-9]+(-[a-z0-9]+)+/?$"  # hyphenated slug, last segment
YEAR_RX = r"/(19|20)[0-9]{2}/"


def is_asset_url_col(url: Column) -> Column:
    """C5: URL points at a non-HTML asset (by extension)."""
    return url.rlike(ASSET_EXT_RX)


def looks_like_listing_col(url: Column) -> Column:
    """C13: listing/index page — routed back to the frontier, not fetched
    as content."""
    return url.rlike(LISTING_RX)


def looks_like_post_col(url: Column) -> Column:
    """C12: content-post URL — hyphenated slug or dated path, and not a
    listing."""
    return (~url.rlike(LISTING_RX)) & (
        url.rlike(POST_SLUG_RX) | url.rlike(YEAR_RX))


def classify_url_col(url: Column) -> Column:
    """Single-pass URL router: asset | listing | post | other. Drives the
    frontier `priority` feature and the fetched-vs-requeued split."""
    return (F.when(is_asset_url_col(url), "asset")
            .when(looks_like_listing_col(url), "listing")
            .when(looks_like_post_col(url), "post")
            .otherwise("other"))
