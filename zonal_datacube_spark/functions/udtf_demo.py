"""Python UDTF (Spark ≥ 3.5) — the table-function slot of SURVEY.md §2.12.

Demo UDTF: explode a document into (position, token, is_stopword) rows —
the tokenizer-as-table-function shape. UDTFs run row-at-a-time in Python;
the engine keeps them off hot paths (explode+split does this JVM-side —
see operators/text.py), but the surface exists for logic that genuinely
needs per-row Python with multi-row output.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

STOPWORDS = {"the", "a"}


@udtf(returnType="pos INT, token STRING, is_stop BOOLEAN")
class TokenizeUDTF:
    """yield one row per token of the input text."""

    def eval(self, doc_id: int, text: str):  # noqa: D102 — UDTF contract
        if text is None:
            return
        for pos, tok in enumerate(text.lower().split(" ")):
            yield pos, tok, tok in STOPWORDS


def register(spark) -> None:
    spark.udtf.register("zds_tokenize", TokenizeUDTF)
