"""Unicode normalization UDF (engine extension per SURVEY.md §2.8 —
the canonicalization pass multilingual training corpora run before
dedup/tokenization: byte-different but canonically-equal strings must
hash identically or exact dedup silently misses them).

Arrow-batched ``pandas_udf`` with a self-contained closure (the
functions/wikitext.py discipline); Spark has no built-in NFC/NFKC
expression, so this is one of the few legitimately-Python per-row
functions in the engine."""

from __future__ import annotations

from pyspark.sql.functions import pandas_udf


@pandas_udf("normalized string, nfc_len bigint")
def unicode_nfc_strip_accents(texts):  # type: ignore[no-untyped-def]
    """NFC-normalize, record the composed length, then strip
    diacritics. Matches DuckDB ``nfc_normalize`` /
    ``strip_accents(nfc_normalize(x))``: NFC composes; NFD
    decomposition then drops combining marks (category Mn)."""
    import unicodedata

    import pandas as pd

    norm, nlen = [], []
    for s in texts:
        if s is None:
            norm.append(None)
            nlen.append(None)
            continue
        c = unicodedata.normalize("NFC", s)
        nlen.append(len(c))
        norm.append(
            "".join(
                ch
                for ch in unicodedata.normalize("NFD", c)
                if unicodedata.category(ch) != "Mn"
            )
        )
    return pd.DataFrame({"normalized": norm, "nfc_len": nlen})
