"""Python UDTF surface (Spark 4 user-defined TABLE functions) — the
extension seam for one-row-in / many-rows-out logic that SQL callers
need as a relation: ``SELECT s.* FROM docs, LATERAL split_sentences(
docs.text) s``.

The reference has no UDTF (SURVEY §2.7 — one untyped scalar UDF); this
closes the generator half of the UDF surface the way
``sources/pydatasource.py`` closes the connector half. Policy note:
UDTFs run in Python workers — the engine's hot text paths stay
JVM-side (``functions/text.py``), and the registry query that
exercises this seam (``lateral_udtf_sentences``) is deliberately
small-input. Use a UDTF when the per-row expansion logic genuinely
can't be expressed with explode/posexplode over builtin arrays
(stateful parsers, external-library tokenizers, format decoders).

Determinism contract: output rows are a pure function of the input
row (no RNG, no clock), so the DuckDB oracle can re-derive them with
regexp_split + UNNEST.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

# Sentence boundary: one or more ./!/? followed by whitespace (or end).
# Kept intentionally simple and portable — DuckDB's regexp_split_to_array
# applies the identical pattern, so both engines produce the same rows.
_SENT_RE = r"[.!?]+\s+"


@udtf(returnType="sent_idx int, sentence string, n_words int")
class SplitSentences:
    """One row per sentence of ``text``, with its 0-based position and
    whitespace word count. Trailing terminators are consumed by the
    split; empty fragments are dropped (a doc of only terminators
    yields zero rows — a UDTF can do that, a scalar UDF cannot)."""

    def eval(self, text: str):  # noqa: D102
        import re

        if text is None:
            return
        for i, frag in enumerate(
            f for f in re.split(_SENT_RE, text) if f.strip()
        ):
            yield i, frag, len(frag.split())


def register_udtfs(spark) -> None:
    """Register the UDTF surface into the session catalog so plain SQL
    can LATERAL-join it."""
    spark.udtf.register("split_sentences", SplitSentences)
    spark.udtf.register("extract_fields", udtf(ExtractFields))


class ExtractFields:
    """Polymorphic UDTF: output schema computed at ANALYSIS time from
    the literal field list — ``LATERAL extract_fields(line, 'a,c')``
    yields columns (a, c); a different literal yields a different
    relation shape. This is the half of the UDTF contract a fixed
    returnType can't express (Spark calls the static ``analyze`` with
    the resolved argument expressions during planning; non-constant
    field lists are rejected there, not at runtime). eval parses
    whitespace-separated ``k=v`` pairs; missing keys yield nulls."""

    @staticmethod
    def analyze(text, fields):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if fields.value is None:
            raise ValueError("extract_fields: field list must be a constant")
        schema = StructType()
        for name in str(fields.value).split(","):
            schema = schema.add(name.strip(), StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, fields: str):  # noqa: D102
        names = [n.strip() for n in fields.split(",")]
        kv = {}
        for part in (text or "").split():
            if "=" in part:
                k, _, v = part.partition("=")
                kv[k] = v
        yield tuple(kv.get(n) for n in names)
