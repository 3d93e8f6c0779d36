"""Text expression helpers (reference T3/T4/T7/T8, SURVEY.md §2.2).

All pure Column expressions — no Python UDFs — so they compile into
whole-stage codegen and vectorize on the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WIKI_BASE_URL = "https://en.wikipedia.org/wiki/"


def clean_whitespace(col: Column | str) -> Column:
    """Collapse whitespace runs to single spaces (T3).

    Reference: ``' '.join(s.split())`` — src/data_processor.py:58-66.
    Collapse BEFORE trim: Spark's trim strips only ' ' (0x20), so a
    tab/newline-bounded string must first have its boundary runs
    collapsed to spaces for trim to remove them (property-tested
    against the Python reference expression in tests)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def word_count(col: Column | str) -> Column:
    """Whitespace token count (T7). Reference src/production_data_processor.py:171.

    Matches Python ``len(s.split())``: empty / whitespace-only text
    counts 0 words — the bare trim+split expression would yield ['']
    with size 1 for '' and miss tab/newline-only strings entirely
    (Spark trim strips only 0x20). Splitting on \\s+ and dropping
    empty tokens is exact for every case; null text stays null, like
    the reference's missing-content path. Oracles mirror the same
    list_filter expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, r"\s+"), lambda x: x != F.lit("")))


def line_count(col: Column | str) -> Column:
    """Line count (T7). Reference src/production_data_processor.py:173."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(c, "\n"))


def build_url(title: Column | str) -> Column:
    """Wikipedia URL from a title (T8). Reference src/mediawiki_client.py:162.

    The reference percent-encodes; we normalize spaces to underscores
    (DuckDB 1.0 lacks url_encode, and MediaWiki titles use underscores).
    """
    t = F.col(title) if isinstance(title, str) else title
    return F.concat(F.lit(WIKI_BASE_URL), F.replace(t, F.lit(" "), F.lit("_")))


def clean_categories(arr: Column | str) -> Column:
    """Strip ``Category:`` prefixes, trim, drop empties (T4).

    Reference extract_categories — src/data_processor.py:68-83. Uses
    higher-order functions (transform/filter), not a UDF.
    """
    a = F.col(arr) if isinstance(arr, str) else arr
    cleaned = F.transform(a, lambda x: F.trim(F.regexp_replace(x, "^Category:", "")))
    return F.filter(cleaned, lambda x: x != F.lit(""))


def is_valid_content(col: Column | str, min_chars: int = 1) -> Column:
    """Validation predicate (F7). Reference validate_article src/data_processor.py:48-56."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (F.length(F.trim(c)) >= min_chars)


def is_redirect(col: Column | str) -> Column:
    """Redirect predicate (F4). Reference src/mediawiki_client.py:150-151."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c).startswith("#redirect")

