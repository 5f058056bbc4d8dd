"""Corpus-quality operators for training-data pipelines: repetition
statistics (the Gopher/C4-style duplicate-word and top-bigram fractions
used as pretraining quality filters) and benchmark decontamination
(n-gram-overlap flagging of corpus documents that leak evaluation data).

Both are pure DataFrame compositions with exact DuckDB mirrors
(plans/oracles.py REPETITION_STATS / decontaminate_sql): list math and
equi-joins only — the benchmark side of the decontamination join is
broadcast (an evaluation suite is always dimension-sized next to a
pretraining corpus), and the corpus side carries (doc_id, shingle) pairs,
never payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(text_col: str):
    ws = F.split(F.lower(F.col(text_col)), " ")
    return F.filter(ws, lambda w: w != "")


def _shingles(ws, n: int):
    """Array of n-word shingles of a word array (empty below n words).

    Deliberately NOT shared with ``operators/dedup.tokenize`` despite the
    identical construction: tokenize keeps empty tokens from repeated
    spaces (its oracle mirrors that) while this module filters them via
    :func:`_words` first — a silent merge of the two would change one
    family's oracle-locked semantics."""
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, (i + k + 1).cast("int"))
                       for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_word_frac_col(text_col: str = "text"):
    """The duplicate-word fraction as a map-only Column — shared by
    :func:`repetition_stats` and consumers that filter on this signal
    alone (corpus_curate), which must not pay the bigram branch (explode
    + two aggregates + a join) for a discarded column; Catalyst cannot
    eliminate that join without uniqueness metadata."""
    ws = _words(text_col)
    n = F.size(ws)
    return F.when(
        n > 0,
        F.round(1 - F.size(F.array_distinct(ws)) / n, 6),
    ).otherwise(F.lit(0.0))


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc repetition features: (doc_id, n_words, dup_word_frac,
    top_bigram_frac).

    ``dup_word_frac`` = 1 - distinct_words/words (0 for empty docs);
    ``top_bigram_frac`` = occurrences of the most frequent bigram divided
    by total bigrams (0 below two words).  High values of either are the
    classic repetition-quality rejection signals for pretraining data.
    """
    from .dedup import fan_out

    ws = _words(text_col)
    n = F.size(ws)
    dup = dup_word_frac_col(text_col)
    # the split/array_distinct/bigram expressions dominate this operator's
    # cost — don't let a one-row-group input pin them at scan parallelism
    df = fan_out(df)
    base = df.select(
        "doc_id", ws.alias("ws"), n.alias("n_words"), dup.alias("dup_word_frac")
    ).persist()  # feeds the output join AND the bigram branch
    from .dedup import pin_session

    pin_session(df.sparkSession, base.unpersist)
    bigrams = (
        base.where(F.col("n_words") >= 2)
        .select(
            "doc_id",
            F.explode(_shingles(F.col("ws"), 2)).alias("bg"),
        )
    )
    per = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
    )
    return (
        base.select("doc_id", "n_words", "dup_word_frac")
        .join(per, "doc_id", "left")
        .select(
            "doc_id", "n_words", "dup_word_frac",
            F.coalesce(
                F.round(F.col("mx") / F.col("tot"), 6), F.lit(0.0)
            ).alias("top_bigram_frac"),
        )
    )


def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, n: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Flag corpus docs sharing any n-word shingle with a benchmark table:
    (doc_id, n_hits, contaminated) — one row per corpus doc, ``n_hits`` =
    number of its distinct shingles that appear anywhere in the benchmark.

    The benchmark's distinct shingle set is broadcast; the corpus explodes
    to (doc_id, shingle) and equi-joins — cost is linear in corpus
    shingles, never corpus x benchmark.

    Both shingle explodes are the expensive per-row stage, and both run at
    their scan's parallelism — fan out first (no-op on inputs already as
    wide as the cluster; the grouped/distinct consumers are
    layout-independent).  Measured at sf0.1 the corpus explode was a
    single-task 9 s stage off the 1-row-group parquet scan.
    """
    from .dedup import fan_out

    c_sh = fan_out(corpus).select(
        "doc_id",
        F.explode(
            F.array_distinct(_shingles(_words(text_col), n))
        ).alias("s"),
    )
    b_sh = fan_out(benchmark).select(
        F.explode(
            F.array_distinct(_shingles(_words(text_col), n))
        ).alias("s")
    ).distinct()
    hits = (
        c_sh.join(F.broadcast(b_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0).cast("long")) > 0)
            .cast("int").alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

#: patterns restricted to the RE2 <-> Java-regex common subset (character
#: classes, \b, bounded repetition; no lookaround, no backrefs) so the
#: Spark path and the DuckDB oracle compile them identically
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{7,15}"  # plus-prefixed international form only


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Redact emails / IPv4 addresses / international phone numbers —
    the standard pretraining-corpus PII pass.

    Each count is taken on the PROGRESSIVELY-REDACTED text (count emails
    on the raw text, redact them, count IPs on the result, ...), so every
    count equals the number of replacements that redaction pass actually
    performed — the patterns mostly don't overlap, but a plus-prefixed
    digit run inside an email local part ('+12345678@foo.com') matches
    both PII_PHONE and PII_EMAIL, and raw-text counts would overstate the
    phone redactions there.  Map-only column work: three regexp_counts +
    three regexp_replaces per row, no shuffle, no UDF.  Output: (id_col,
    n_emails, n_ips, n_phones, scrub_md5) — the md5 of the scrubbed text
    stands in for shipping the text through the comparison harness."""
    t = F.col(text_col)
    t1 = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return df.select(
        id_col,
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t1, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count(t2, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.md5(t3).alias("scrub_md5"),
    )
