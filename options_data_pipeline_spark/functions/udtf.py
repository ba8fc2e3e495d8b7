"""Python UDTF surface (SURVEY §2.10).

The reference defines no SQL UDFs/UDTFs and none are needed on the hot
path — every row-generating shape in this engine is native
``explode``/``posexplode`` (see ``plans/text.py:q_doc_chunks``). This
module exists to prove the UDTF surface itself: when logic genuinely
cannot be expressed as array expressions (imperative tokenizers,
recursive descent parsers), a Python UDTF is the sanctioned escape
hatch — and its output here is pinned BYTE-EQUAL to the native explode
twin by ``tests/test_udtf.py``, which is exactly the gate any future
UDTF must pass before replacing a native shape.

UDTFs are the slow path (one Python process hop per partition): prefer
``explode`` unless the generator is genuinely imperative.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: int, chunk_text: string")
class ChunkText:
    """Yield fixed-width whitespace-token windows of ``text`` — the
    imperative twin of the `doc_chunks` sequence+explode expression."""

    def eval(self, text: str, width: int):  # noqa: A002
        if text is None:
            return
        toks = text.split(" ")
        for i in range(0, len(toks), width):
            yield i // width, " ".join(toks[i : i + width])


def register_udtfs(spark) -> None:
    """Register the UDTF surface on a session (SQL: LATERAL chunk_text)."""
    spark.udtf.register("chunk_text", ChunkText)
