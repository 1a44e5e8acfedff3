"""Python UDTF surface (SURVEY §2.9 completion).

The reference's UDF inventory is row-wise `apply` + encryption
(`healthcare-data-pipeline-main.py:193,626-629`); our engine covers
scalar (builtins), GROUPED_AGG / GROUPED_MAP (functions/vectorized.py)
and mapInPandas (multimodal/binary_ops.py). This module adds the last
surface Spark offers: user-defined *table* functions — one input row
to many output rows with a declared schema, usable from both the
DataFrame API and SQL (`LATERAL`).

Doctrine unchanged: Python UDTFs are the slow path (row-at-a-time
pickling, no codegen). They exist for semantics the relational
operators can't express — per-row expansion with stateful/imperative
logic. Anything expressible as explode(transform(...)) should stay
JVM-side (see queries/datapipe*.py); the tests pin that the two forms
agree so the fast path can always substitute.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string, is_stop boolean")
class TokenizeUDTF:
    """Expand a document into (position, token, stopword-flag) rows.

    Imperative twin of `explode(tokens(text))` — the fast path; kept
    for parity with engines whose tokenizers are library calls.
    """

    _STOP = frozenset(
        "the a of and to in is der die und le la et el los y en de".split()
    )

    def eval(self, text: str):  # noqa: D401 - UDTF contract
        if text is None:
            return
        pos = 0
        for raw in text.split():
            if raw:
                yield pos, raw, raw in self._STOP
                pos += 1


@udtf(returnType="start_pos int, end_pos int, n_tokens int, chunk string")
class ChunkUDTF:
    """Split a document into overlapping fixed-size token windows —
    the context-window chunker of a RAG/training-shard pipeline
    (window 32 tokens, stride 24). Stateful per-row logic (carry-over
    windows) is what earns this a UDTF instead of a higher-order
    expression. UDTF constructors must be no-arg (or implement
    `analyze`), so the geometry is class-level.
    """

    WINDOW = 32
    STRIDE = 24

    def eval(self, text: str):
        if text is None:
            return
        toks = text.split()
        if not toks:
            return
        w, s = self.WINDOW, self.STRIDE
        for start in range(0, max(len(toks) - w, 0) + s, s):
            piece = toks[start : start + w]
            if not piece:
                break
            yield start, start + len(piece), len(piece), " ".join(piece)
            if start + w >= len(toks):
                break
