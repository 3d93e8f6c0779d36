"""Wikitext → plain-text pandas UDF (reference T6, the one genuine
black-box per-row function in the system:
src/production_mediawiki_client.py:106-118 — wikitextparser.parse(x)
.plain_text() with a keep-original fallback on parse failure).

Arrow-batched ``pandas_udf`` — never a row-at-a-time Python UDF. The
``wikitextparser`` library is not in this environment, so the worker
closure import-gates it and falls back to the regex core (same
fallback the reference applies on parse errors, :115-118). The closure
is self-contained (pickled by value; workers can't import this
package). The JVM-side regex form (plans/reference_ops.py
t6_wikitext_strip) is the hot-path default — this UDF exists for
full-fidelity parsing when the library is present."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def wikitext_to_plain(texts):  # type: ignore[no-untyped-def]
    import re

    import pandas as pd

    try:
        import wikitextparser as wtp  # type: ignore[import-not-found]

        def _strip(s: str) -> str:
            try:
                return wtp.parse(s).plain_text()
            except Exception:  # noqa: BLE001 — reference fallback :115-118
                return s

    except ImportError:
        link = re.compile(r"\[\[(?:[^\]|]*\|)?([^\]]*)\]\]")
        bold = re.compile(r"'{2,}")

        def _strip(s: str) -> str:
            return bold.sub("", link.sub(r"\1", s))

    return pd.Series([_strip(s) if s is not None else None for s in texts])


def plain_text_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return wikitext_to_plain(c)
