"""Text-analysis operators for training-data pipelines.

Language-ID (marker-word heuristic), quality scoring (length / punctuation /
stopword ratios), BPE-ish token counting, and document fingerprinting over
the ``documents`` table — all built-in column functions (JVM, whole-stage
codegen), no Python UDFs. Every helper has a DuckDB-SQL twin in
plans/training_queries.py; tokenization is the dialect-neutral
``split(lower(trim(text)), ' ')`` in both engines so results hash-compare.

Scale notes: all per-document ops are narrow (no shuffle) and column-pruned —
at 100 TB these run at scan speed; fingerprints feed the dedup operators
(dedup.py) which do the shuffling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols.
# RE2/Java-compatible so Spark and DuckDB extract identical token streams.
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

EN_STOPWORDS = ["the", "and", "is", "of", "to", "a", "in", "it", "that", "for"]

# Per-language marker words for the n-gram/marker language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "les", "et", "des", "une"],
}


def norm_text(c: Column) -> Column:
    return F.lower(F.trim(c))


def words(c: Column) -> Column:
    return F.split(norm_text(c), " ")


def bpe_tokens(c: Column) -> Column:
    return F.regexp_extract_all(norm_text(c), F.lit(BPE_TOKEN_RE), 0)


def fingerprint(c: Column) -> Column:
    """Content fingerprint: md5 of normalized text (identical hex in DuckDB)."""
    return F.md5(norm_text(c))


def _count_in(tokens: Column, vocab: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


# PII patterns, deliberately conservative and RE2/Java-compatible so the
# DuckDB oracle applies the IDENTICAL regexes (same matches, same redacted
# text, hash-comparable). Order matters: emails before phones (an email's
# digit run must not be half-eaten by the phone pattern), IPs before phones
# (dotted quads contain phone-length digit runs).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d[\d()\- ]{6,}\d", "[PHONE]"),
]


def redact_pii(docs: DataFrame, col: str = "text") -> DataFrame:
    """Scrub emails / IPv4s / phone-like digit runs from a text column.

    Adds ``{col}_redacted`` plus per-category match counts
    (``n_email``/``n_ip``/``n_phone``). Pure ``regexp_replace`` /
    ``regexp_extract_all`` column expressions — narrow, codegen'd, scan-speed
    at 100 TB; the standard pre-training scrub pass a corpus pipeline runs
    before tokenization. Each category counts matches in the PREVIOUS
    stage's output (the text its replacement actually sees), so counts
    equal replacements even when categories overlap (a phone-length digit
    run inside an already-redacted email is not re-counted).
    """
    out = docs
    cur = F.col(col)
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.size(F.regexp_extract_all(cur, F.lit(pat), 0)))
        cur = F.regexp_replace(cur, pat, token)
    return out.withColumn(f"{col}_redacted", cur)


def text_quality(docs: DataFrame) -> DataFrame:
    """Per-document quality metrics + tiered label.

    punct_ratio is over normalized chars; stopword_ratio over whitespace
    words. The tier thresholds are heuristic but deterministic.
    """
    t = norm_text(F.col("text"))
    w = words(F.col("text"))
    n_chars = F.length(t)
    n_words = F.size(w)
    n_bpe = F.size(bpe_tokens(F.col("text")))
    punct = (n_chars - F.length(F.regexp_replace(t, r"[^a-z0-9\s]", ""))).cast("double")
    stop = _count_in(w, EN_STOPWORDS).cast("double")
    punct_ratio = punct / F.nullif(n_chars.cast("double"), F.lit(0.0))
    stop_ratio = stop / F.nullif(n_words.cast("double"), F.lit(0.0))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_norm"),
        n_words.alias("n_words"),
        n_bpe.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        F.when((n_words >= 50) & (stop_ratio >= 0.05) & (punct_ratio <= 0.2), "good")
        .when(n_words >= 10, "fair")
        .otherwise("poor")
        .alias("quality_tier"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID with deterministic argmax (en>es>de>fr on
    ties, 'unknown' when no marker hits). Emits the dataset's labeled lang
    for comparison."""
    w = words(F.col("text"))
    scores = {lang: _count_in(w, markers) for lang, markers in LANG_MARKERS.items()}
    en, es, de, fr = scores["en"], scores["es"], scores["de"], scores["fr"]
    pred = (
        F.when((en > 0) & (en >= es) & (en >= de) & (en >= fr), "en")
        .when((es > 0) & (es >= de) & (es >= fr), "es")
        .when((de > 0) & (de >= fr), "de")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        en.alias("score_en"),
        es.alias("score_es"),
        de.alias("score_de"),
        fr.alias("score_fr"),
        pred.alias("predicted_lang"),
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """doc_id -> md5 content fingerprint + a 16-hex-char short fingerprint."""
    fp = fingerprint(F.col("text"))
    return docs.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 16).alias("fingerprint16")
    )


def token_stats_by_lang(docs: DataFrame) -> DataFrame:
    """Corpus-level token accounting grouped by labeled language."""
    n_bpe = F.size(bpe_tokens(F.col("text")))
    n_words = F.size(words(F.col("text")))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(n_bpe.cast("long")).alias("total_tokens"),
        F.sum(n_words.cast("long")).alias("total_words"),
        (F.sum(n_bpe.cast("long")).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_tokens_per_doc"
        ),
    )


def ngram_shingle_index(docs: DataFrame, n: int = 5) -> DataFrame:
    """(doc_id, shingle) exploded DISTINCT word-n-gram index — the shared
    primitive behind decontamination and the curation pipeline (single
    definition so the shingle width/normalization can't drift between the
    oracle-gated entry and its composition sites). Same explode_outer +
    null-filter shape as dedup._shingle_index (see the plan note there).

    Round 16 (guide §2.3): every consumer treats the shingle as an opaque
    equi-join key (decontamination joins train x eval on it and outputs doc
    ids only), so the index carries ``xxhash64`` int64 shingles instead of
    concatenated n-word strings — no string assembly at scan, fixed-width
    join/shuffle keys (multi-arg xxhash64 chains per-argument seeds, so
    word-boundary shifts cannot alias; collisions ~2^-64 per key pair)."""
    elem = f"xxhash64({', '.join(f'_w[i+{j}]' for j in range(n))})"
    return (
        docs.select("doc_id", F.split(F.lower(F.trim(F.col("text"))), " ").alias("_w"))
        .select(
            "doc_id",
            F.explode_outer(
                F.expr(
                    f"CASE WHEN size(_w) >= {n} "
                    f"THEN array_distinct(transform(sequence(0, size(_w) - {n}), i -> {elem})) "
                    "ELSE array() END"
                )
            ).alias("shingle"),
        )
        .where(F.col("shingle").isNotNull())
    )


def chunk_documents(docs: DataFrame, chunk_size: int = 16, stride: int = 8) -> DataFrame:
    """Overlapping fixed-size token chunks per document — the pretraining
    chunking primitive (context-window packing input).

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_size)`` of the
    whitespace tokenization; the tail chunk is partial. One row per chunk
    with its token count and an md5 content fingerprint (feeds chunk-level
    dedup exactly like doc_fingerprints feeds doc-level).

    Scale notes: pure narrow explode — no shuffle, runs at scan speed, and
    output width is ids+hashes, never the chunk text itself. The explode
    factor is ~n_tokens/stride, so partition sizing follows directly from
    ``spark.sql.files.maxPartitionBytes`` over the text column; at 100 TB
    feed it pre-pruned (doc_id, text) columns only.
    """
    toks = words(F.col("text"))
    base = docs.select("doc_id", "source", toks.alias("toks"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(F.col("toks")) - 1, F.lit(0)), F.lit(stride)
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, chunk_size)
    return (
        base.select("doc_id", "source", "toks", F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            "source",
            "chunk_id",
            F.size(chunk).alias("n_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
        )
    )
