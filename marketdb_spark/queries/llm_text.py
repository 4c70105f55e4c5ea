"""Text-analysis queries on `documents` (SURVEY §2B [N]): stats, token
counting, language-ID, fingerprinting. Spark side is pure built-in column
functions (marketdb_spark.functions.text); oracles mirror them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.functions.text import (
    avg_token_len,
    fingerprint,
    language_id,
    punct_count,
    token_count,
    tokens,
)
from marketdb_spark.queries.registry import query

# DuckDB fragments kept in lockstep with functions/text.py
_ORACLE_TOKENS = r"list_filter(string_split_regex(text, '\s+'), t -> t != '')"
_ORACLE_NTOK = f"CAST(len({_ORACLE_TOKENS}) AS BIGINT)"


@query(
    "doc_text_stats",
    oracle=rf"""
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           {_ORACLE_NTOK} AS n_tokens,
           CASE WHEN {_ORACLE_NTOK} > 0
                THEN CAST(LENGTH(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                     / {_ORACLE_NTOK}
           END AS avg_token_len,
           CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g'))
                AS BIGINT) AS n_punct
    FROM documents
    """,
)
def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality stats — all JVM-side column functions, no UDF."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        token_count("text").alias("n_tokens"),
        avg_token_len("text").alias("avg_token_len"),
        punct_count("text").alias("n_punct"),
    )


@query(
    "doc_token_totals",
    oracle=f"""
    SELECT source,
           CAST(SUM({_ORACLE_NTOK}) AS BIGINT) AS total_tokens,
           (CAST(SUM({_ORACLE_NTOK}) AS DOUBLE) / COUNT(*)) AS avg_tokens_per_doc,
           CAST(MAX({_ORACLE_NTOK}) AS BIGINT) AS max_tokens
    FROM documents
    GROUP BY source
    """,
)
def doc_token_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source (integer sums: exact anywhere)."""
    docs = load(spark, sf_dir, "documents")
    n = token_count("text")
    return docs.groupBy("source").agg(
        F.sum(n).alias("total_tokens"),
        (F.sum(n).cast("double") / F.count("*")).alias("avg_tokens_per_doc"),
        F.max(n).alias("max_tokens"),
    )


# Tie-break must mirror F.array_max over (score, lang) structs: highest
# score wins; on ties the lexicographically *last* language code wins.
_LANG_ORACLE = """
    WITH scored AS (
      SELECT doc_id, lang,
        len(list_filter({toks}, t -> t IN ('the','a','of','and','to','in','is'))) AS s_en,
        len(list_filter({toks}, t -> t IN ('le','la','et','les','des','un','une'))) AS s_fr,
        len(list_filter({toks}, t -> t IN ('el','los','las','y','una','que','por'))) AS s_es,
        len(list_filter({toks}, t -> t IN ('der','die','das','und','ein','nicht','ist'))) AS s_de
      FROM documents
    )
    SELECT doc_id, lang,
      CASE
        WHEN s_fr > 0 AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
        WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de THEN 'es'
        WHEN s_en > 0 AND s_en >= s_de THEN 'en'
        WHEN s_de > 0 THEN 'de'
        ELSE 'und'
      END AS predicted_lang
    FROM scored
""".format(toks=_ORACLE_TOKENS)


@query("doc_language_id", oracle=_LANG_ORACLE)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID (deterministic heuristic; the operator
    shape matters, not linguistic accuracy — see functions/text.py)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", language_id("text").alias("predicted_lang")
    )


@query(
    "doc_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of normalized text (portable across engines)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


@query(
    "doc_vocab_topwords",
    oracle=f"""
    SELECT token,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           COUNT(*) AS total_occurrences
    FROM (
      SELECT doc_id, UNNEST({_ORACLE_TOKENS}) AS token
      FROM documents
    )
    GROUP BY token
    """,
)
def doc_vocab_topwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary builder: explode tokens, count global occurrences — the
    map-side-combine aggregation shape that matters at corpus scale.
    explode_outer + null-filter so InferFiltersFromGenerate doesn't push a
    re-inlined tokenization into the scan (see operators.dedup docstring)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode_outer(tokens("text")).alias("token"))
        .filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("total_occurrences"),
        )
    )


# --- PII redaction ---------------------------------------------------------
# The synthetic corpus has no digits/emails, so a deterministic contact
# string derived from doc_id is appended first — the *operator* under test
# is regexp redaction at corpus scale, and the oracle replays the identical
# construction. Patterns are restricted to the RE2 ∩ Java-regex dialect.
_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_PAT = r"\+\d-\d{3}-\d{4}"
_RAW_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com or +1-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@query(
    "doc_pii_redact",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_RAW_SQL} AS raw FROM documents),
    red AS (
      SELECT doc_id, raw,
             regexp_replace(regexp_replace(raw, '{_EMAIL_PAT}', '[EMAIL]', 'g'),
                            '{_PHONE_PAT}', '[PHONE]', 'g') AS redacted
      FROM raw
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_PAT}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(raw, '{_PHONE_PAT}')) AS BIGINT) AS n_phones,
           CAST(LENGTH(redacted) AS BIGINT) AS clean_len,
           right(redacted, 30) AS tail
    FROM red
    """,
)
def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: count + redact emails/phone
    numbers with built-in regexp functions (JVM-side, map-only — no UDF).
    At 100 TB this is a pure map stage: no shuffle, fully pushdown-friendly."""
    docs = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    red = docs.select(
        "doc_id",
        raw.alias("raw"),
    ).select(
        "doc_id",
        "raw",
        F.regexp_replace(
            F.regexp_replace("raw", _EMAIL_PAT, "[EMAIL]"), _PHONE_PAT, "[PHONE]"
        ).alias("redacted"),
    )
    return red.select(
        "doc_id",
        F.regexp_count("raw", F.lit(_EMAIL_PAT)).cast("long").alias("n_emails"),
        F.regexp_count("raw", F.lit(_PHONE_PAT)).cast("long").alias("n_phones"),
        F.length("redacted").cast("long").alias("clean_len"),
        F.substring("redacted", -30, 30).alias("tail"),
    )


@query(
    "doc_length_histogram",
    oracle=f"""
    WITH t AS (SELECT {_ORACLE_NTOK} AS ntok, n_chars FROM documents)
    SELECT ntok - ntok % 25 AS bin_lo,
           COUNT(*) AS n_docs,
           (CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)) AS avg_chars,
           CAST(MIN(ntok) AS BIGINT) AS min_tokens,
           CAST(MAX(ntok) AS BIGINT) AS max_tokens
    FROM t GROUP BY bin_lo
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: width-25 token-count bins (integer arithmetic
    only — engine-exact), doc counts and char averages per bin. The groupBy
    key has ~dozens of distinct values → map-side partial aggregation does
    nearly all the work; safe at any scale."""
    docs = load(spark, sf_dir, "documents")
    ntok = token_count("text")
    binned = docs.select(
        (ntok - ntok % 25).alias("bin_lo"),
        ntok.alias("ntok"),
        "n_chars",
    )
    return binned.groupBy("bin_lo").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.min("ntok").alias("min_tokens"),
        F.max("ntok").alias("max_tokens"),
    )


@query(
    "doc_token_bpe_est",
    oracle=rf"""
    SELECT doc_id,
           {_ORACLE_NTOK} AS n_ws_tokens,
           CAST(coalesce(list_sum(list_transform(
                  regexp_extract_all(text, '[A-Za-z0-9]+'),
                  t -> (length(t) + 3) // 4)), 0)
                + len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
                AS BIGINT) AS n_bpe_est
    FROM documents
    """,
)
def doc_token_bpe_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token-count estimate (SURVEY §2B [N] "whitespace + a BPE-ish
    regex"): alphanumeric runs contribute ceil(len/4) subword tokens
    (~4 chars/token, the common BPE rule of thumb); every other non-space
    symbol is one token. Pure integer arithmetic on regexp matches —
    engine-exact, map-only, no UDF."""
    docs = load(spark, sf_dir, "documents")
    words = F.regexp_extract_all("text", F.lit("[A-Za-z0-9]+"), F.lit(0))
    # (len+3)/4 on longs is double division in Spark — floor() pins the
    # integer ceil-division semantics the oracle's // computes
    n_sub = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.floor((F.length(t) + 3) / 4).cast("long"),
    )
    n_other = F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]")).cast("long")
    from marketdb_spark.functions.text import token_count as _tc

    return docs.select(
        "doc_id",
        _tc("text").alias("n_ws_tokens"),
        (n_sub + n_other).alias("n_bpe_est"),
    )


# English stopword list shared with functions.text.LANG_STOPWORDS["en"]
_EN_STOPS = "('the','a','of','and','to','in','is')"


@query(
    "doc_quality_score",
    oracle=rf"""
    WITH m AS (
      SELECT doc_id,
             {_ORACLE_NTOK} AS ntok,
             CAST(LENGTH(text) AS BIGINT) AS nchars,
             CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g'))
                  AS BIGINT) AS npunct,
             CAST(len(list_filter({_ORACLE_TOKENS}, t -> t IN {_EN_STOPS}))
                  AS BIGINT) AS nstop
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN ntok > 0 THEN CAST(nstop AS DOUBLE) / ntok ELSE 0.0 END
             AS stopword_ratio,
           CASE WHEN nchars > 0 THEN CAST(npunct AS DOUBLE) / nchars ELSE 0.0 END
             AS punct_ratio,
           CASE WHEN ntok BETWEEN 20 AND 1000
                 AND (CASE WHEN ntok > 0
                           THEN CAST(nstop AS DOUBLE) / ntok ELSE 0.0 END) >= 0.01
                 AND (CASE WHEN nchars > 0
                           THEN CAST(npunct AS DOUBLE) / nchars ELSE 0.0 END) < 0.1
                THEN TRUE ELSE FALSE END AS keep
    FROM m
    """,
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate for training corpora (SURVEY §2B [N]
    "quality scoring (length/punct/stopword ratios)"): a doc is kept when
    its length is in-band, it contains some English stopwords (fluency
    proxy), and it is not punctuation-soup. All ratios are single
    divisions of exact integer counts — engine-identical. Map-only; at
    100 TB this is the pre-dedup filter pass that discards junk before any
    shuffle happens."""
    docs = load(spark, sf_dir, "documents")
    toks = tokens("text")
    ntok = token_count("text")
    nchars = F.length("text").cast("long")
    npunct = punct_count("text")
    nstop = F.size(
        F.filter(
            toks,
            lambda t: t.isin("the", "a", "of", "and", "to", "in", "is"),
        )
    ).cast("long")
    stop_ratio = F.when(ntok > 0, nstop.cast("double") / ntok).otherwise(0.0)
    punct_ratio = F.when(nchars > 0, npunct.cast("double") / nchars).otherwise(0.0)
    keep = (
        ntok.between(20, 1000) & (stop_ratio >= 0.01) & (punct_ratio < 0.1)
    )
    return docs.select(
        "doc_id",
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        keep.alias("keep"),
    )


@query(
    "doc_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_ORACLE_NTOK} AS n_tokens FROM documents
    ),
    p AS (
      SELECT doc_id, n_tokens,
             CAST(coalesce(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
      FROM t
    )
    SELECT doc_id, n_tokens, "offset",
           "offset" // 2048 AS start_chunk,
           CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // 2048
                ELSE "offset" // 2048 END AS end_chunk,
           CAST(CASE WHEN n_tokens > 0
                     THEN ("offset" + n_tokens - 1) // 2048
                          - "offset" // 2048 + 1
                     ELSE 0 END AS BIGINT) AS n_chunks
    FROM p
    """,
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concatenate-then-split training layout): documents
    laid out in doc_id order, the token stream cut every 2048 tokens; each
    doc reports the chunk span it lands in. The global offset is a
    distributed two-phase prefix sum (operators.packing) — NOT a
    single-task Window.orderBy over the whole corpus, which is the
    classic scale trap this operator exists to avoid."""
    from marketdb_spark.operators.packing import pack_sequences

    docs = load(spark, sf_dir, "documents")
    return pack_sequences(
        docs.select("doc_id", token_count("text").alias("ntok")),
        "doc_id",
        "ntok",
        seq_len=2048,
    )


# positional (non-distinct) word n-grams, mirroring operators.dedup.shingles
# with distinct=False: range(1, len-n+2) yields one gram per start position
_RAW_G2 = f"list_transform(range(1, len({_ORACLE_TOKENS})), i -> {_ORACLE_TOKENS}[i] || ' ' || {_ORACLE_TOKENS}[i+1])"
_RAW_G3 = (
    f"list_transform(range(1, len({_ORACLE_TOKENS}) - 1), "
    f"i -> {_ORACLE_TOKENS}[i] || ' ' || {_ORACLE_TOKENS}[i+1]"
    f" || ' ' || {_ORACLE_TOKENS}[i+2])"
)


@query(
    "doc_repetition_ratio",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, {_RAW_G2} AS g2, {_RAW_G3} AS g3 FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(g2) > 0
                THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
                ELSE 0.0 END AS dup_2gram_ratio,
           CASE WHEN len(g3) > 0
                THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
                ELSE 0.0 END AS dup_3gram_ratio,
           (CASE WHEN len(g2) > 0
                 THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
                 ELSE 0.0 END) < 0.20
           AND (CASE WHEN len(g3) > 0
                     THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
                     ELSE 0.0 END) < 0.18 AS keep
    FROM g
    """,
)
def doc_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signal (the Gopher/MassiveText rule family):
    fraction of word 2-grams / 3-grams that are duplicates of an earlier
    occurrence in the same document; boilerplate and spam score high.
    keep = both ratios under the (Gopher-ish) 0.20/0.18 thresholds.

    Integer counts and one double division — engine-exact. Map-only (zero
    shuffles): at 100 TB this composes with doc_quality_score as the
    pre-dedup gate. Plan shape: tokens materialized once, gram arrays built
    from the bound column (see operators.dedup.shingles docstring)."""
    from marketdb_spark.operators.dedup import shingles

    docs = load(spark, sf_dir, "documents")
    g = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id",
        shingles(F.col("toks"), 2, distinct=False).alias("g2"),
        shingles(F.col("toks"), 3, distinct=False).alias("g3"),
    )

    def ratio(col: str):
        n = F.size(F.col(col))
        dup = n - F.size(F.array_distinct(F.col(col)))
        return F.when(n > 0, dup.cast("double") / n).otherwise(0.0)

    return g.select(
        "doc_id",
        ratio("g2").alias("dup_2gram_ratio"),
        ratio("g3").alias("dup_3gram_ratio"),
        ((ratio("g2") < 0.20) & (ratio("g3") < 0.18)).alias("keep"),
    )


_H60 = "CAST(('0x' || substring(md5({s}), 1, 15)) AS BIGINT)"


@query(
    "doc_winnow_fingerprints",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             list_transform(range(1, LENGTH(text) - 8 + 2),
               i -> {_H60.format(s='substring(text, CAST(i AS INT), 8)')}) AS hs,
             LENGTH(text) - 8 + 1 AS m
      FROM documents WHERE LENGTH(text) >= 11
    ),
    sel AS (
      SELECT doc_id,
             list_transform(range(1, m - 4 + 2),
               j -> list_min(hs[j : j + 3])) AS fps
      FROM h
    )
    SELECT doc_id,
           CAST(len(list_distinct(fps)) AS BIGINT) AS n_fp,
           list_min(fps) AS min_fp,
           list_max(fps) AS max_fp
    FROM sel
    """,
)
def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (Schleimer et al.,
    SIGMOD'03 — the MOSS algorithm): hash every char 8-gram (rolling
    positions), then keep the minimum hash of each 4-window; the selected
    set is the document's fingerprint (guaranteed-overlap substring
    matching, robust to insertions unlike whole-doc md5). Reported as
    (count, min, max) of the distinct selection — set summaries, no
    array-typed output.

    Plan shape: two projections so the hash array is computed ONCE and the
    window-min pass references it as a bound column (Catalyst re-inlines
    lambda-captured expressions per element — the repo's #1 perf trap);
    entirely map-side, zero shuffles."""
    from marketdb_spark.functions.text import token_hash64

    docs = load(spark, sf_dir, "documents").filter(F.length("text") >= 11)
    m = (F.length("text") - 7).cast("int")
    hashed = docs.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: token_hash64(F.col("text").substr(i.cast("int"), F.lit(8))),
        ).alias("hs"),
        (m - 3).alias("n_win"),
    )
    sel = hashed.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.col("n_win")),
            lambda j: F.array_min(F.slice("hs", j.cast("int"), 4)),
        ).alias("fps"),
    )
    return sel.select(
        "doc_id",
        F.size(F.array_distinct("fps")).cast("long").alias("n_fp"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


@query(
    "doc_tfidf_topterms",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM (SELECT doc_id, UNNEST({_ORACLE_TOKENS}) AS token FROM documents)
      GROUP BY doc_id, token
    ), df AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * ((SELECT n FROM n) + 1.0) / (df.df + 1.0) DESC,
                        tf.token
             ) AS rnk
      FROM tf JOIN df USING (token)
    )
    WHERE rnk <= 3
    """,
)
def doc_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF terms (keyword extraction for corpus curation).
    IDF is the smoothed rational (N+1)/(df+1) — no transcendental ln, so
    the double arithmetic is bit-identical across engines and the ranking
    hash-compares exactly. Shapes that matter at 100 TB: tokenize map-side,
    two keyed aggregations with partial combine, a shuffle join on token
    (vocabulary too big to assume broadcastable — AQE may still choose it
    at small SF), corpus size N as a broadcast 1-row cross join, and a
    bounded per-doc window (top-3)."""
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = (
        docs.select("doc_id", F.explode_outer(tokens("text")).alias("token"))
        .filter(F.col("token").isNotNull())
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * (F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tf", "df", F.col("rnk").cast("int"))
    )


@query(
    "doc_chunk_overlap",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, {_ORACLE_TOKENS} AS ts FROM documents
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(len(list_slice(ts, i*48 + 1, i*48 + 64)) AS INT) AS n_tokens,
           md5(array_to_string(list_slice(ts, i*48 + 1, i*48 + 64), ' '))
             AS chunk_md5
    FROM tok, LATERAL UNNEST(generate_series(
           0, CAST(GREATEST(CEIL((len(ts) - 64.0) / 48.0), 0) AS INT))) AS g(i)
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking for training-sequence prep: 64-token
    chunks, stride 48 (16-token overlap), per-chunk content hash. Pure
    map-side work — tokenize, sequence-generate chunk indices, slice,
    explode — no shuffle at all, so it scales linearly with corpus bytes.
    The chunk md5 makes the oracle compare chunk CONTENT, not just counts."""
    docs = load(spark, sf_dir, "documents")
    C, S = 64, 48
    toks = docs.select("doc_id", tokens("text").alias("ts"))
    chunked = toks.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.ceil((F.size("ts") - F.lit(float(C))) / F.lit(float(S))),
                    F.lit(0),
                ).cast("int"),
            )
        ).alias("chunk_idx"),
        "ts",
    )
    chunk = F.slice(F.col("ts"), F.col("chunk_idx") * S + 1, C)
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("int"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.md5(F.encode(F.concat_ws(" ", chunk), "utf-8")).alias("chunk_md5"),
    )


@query(
    "text_bigram_counts",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_ORACLE_TOKENS} AS ts FROM documents
    ), bg AS (
      SELECT ts[i] AS w1, ts[i+1] AS w2
      FROM tok, LATERAL UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
    )
    SELECT w1, w2, COUNT(*) AS n
    FROM bg GROUP BY w1, w2
    HAVING COUNT(*) >= 5
    """,
)
def text_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model counts (the n-gram statistics behind
    repetition filters and LM-based quality scores): adjacent-token pairs
    via a map-side zip of the token array with its own tail — explode, one
    keyed aggregation with partial combine, integer-exact everywhere. The
    HAVING floor keeps the long tail out of the result, the same pruning a
    count-min/LM vocabulary build applies at scale."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(tokens("text").alias("ts"))
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
            )
        ).alias("p")
    )
    return (
        pairs.select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )


@query(
    "text_pmi_collocations",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_ORACLE_TOKENS} AS ts FROM documents
    ),
    uni AS (
      SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok, LATERAL UNNEST(ts) AS u(t) GROUP BY t
    ),
    bg AS (
      SELECT ts[i] AS w1, ts[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS cab
      FROM tok, LATERAL UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
      GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(c) AS HUGEINT) AS n_tok FROM uni),
    btot AS (SELECT CAST(SUM(cab) AS HUGEINT) AS n_bg FROM bg)
    SELECT b.w1, b.w2, b.cab, ua.c AS ca, ub.c AS cb,
           CAST(CAST(b.cab AS HUGEINT) * n_tok * n_tok AS DOUBLE)
             / CAST(CAST(ua.c AS HUGEINT) * ub.c * n_bg AS DOUBLE)
             AS pmi_ratio
    FROM bg b
    JOIN uni ua ON ua.w = b.w1
    JOIN uni ub ON ub.w = b.w2, tot, btot
    WHERE b.cab >= 5
    ORDER BY pmi_ratio DESC, b.w1, b.w2
    LIMIT 20
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLOCATION extraction — the corpus's top bigrams by pointwise
    mutual information, the classic statistic behind phrase mining /
    tokenizer-merge candidates / boilerplate detection (words that
    co-occur far more than independence predicts). PMI's log is
    monotone, so ranking by the RAW INDEPENDENCE RATIO
    P(w1,w2)/(P(w1)·P(w2)) = cab·N²/(ca·cb·Nb) avoids the one
    transcendental both engines could round differently: numerator and
    denominator are EXACT integer products (decimal(38,0) / HUGEINT)
    and the score is a single double division of identical exact ints —
    bit-identical cross-engine, so the top-20 SET (ties broken by the
    bigram itself) survives the hash gate. Shape: one corpus scan feeds
    both count tables (map-side explode + two-phase counts); the corpus
    totals come from empty-frame windows over the ALREADY-AGGREGATED
    vocab/bigram tables (vocabulary-sized single-partition passes, not
    corpus re-scans); the two unigram attachments broadcast the
    vocab-bounded count table; top-20 is a TakeOrderedAndProject. The
    min-count floor (cab ≥ 5) is the standard PMI low-frequency guard
    — and the reason the broadcast stays small at any corpus size."""
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(tokens("text").alias("ts"))
    uni = (
        toks.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    bg = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                    F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                )
            ).alias("p")
        )
        .select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cab"))
    )
    everything = W.partitionBy()  # over the aggregated frames only
    uni = uni.withColumn(
        "n_tok", F.sum("c").over(everything).cast("decimal(38,0)")
    )
    bg = bg.withColumn(
        "n_bg", F.sum("cab").over(everything).cast("decimal(38,0)")
    )
    ua = uni.select(
        F.col("w").alias("w1"), F.col("c").alias("ca"), "n_tok"
    )
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("cb"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (dec("cab") * F.col("n_tok") * F.col("n_tok")).cast("double")
    den = (dec("ca") * dec("cb") * F.col("n_bg")).cast("double")
    return (
        bg.filter(F.col("cab") >= 5)
        .join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .select(
            "w1", "w2", "cab", "ca", "cb", (num / den).alias("pmi_ratio")
        )
        .orderBy(F.col("pmi_ratio").desc(), "w1", "w2")
        .limit(20)
    )


@query(
    "corpus_mixture_weights",
    oracle=f"""
    WITH s AS (
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM({_ORACLE_NTOK}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source, lang
    ),
    w AS (
      SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000)
                     AS BIGINT) AS weight_u
      FROM s
    )
    SELECT source, lang, n_docs, n_tokens, weight_u,
           CAST((n_tokens * 1000000)
                // (SELECT SUM(n_tokens) FROM s) AS BIGINT) AS share_ppm,
           CAST((10000 * weight_u)
                // (SELECT SUM(weight_u) FROM w) AS BIGINT) AS quota_docs
    FROM w
    """,
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-MIXING weights for multi-source/multi-lingual training — the
    sampling schedule step every LLM corpus pipeline runs after cleaning:
    per (source, lang) stratum, token counts plus a temperature-scaled
    sampling weight w = tokens^alpha with alpha = 0.5 (upsamples the
    tail, downweights the head — the multilingual-LM recipe), and the
    resulting integer document quota out of a 10k-batch budget. sqrt is
    the ONE float op and is IEEE-exactly-rounded on both engines (inputs
    are integers < 2^52), so floor(1e6*sqrt(n)) is deterministic; shares
    and quotas are integer floor-division against the single-row totals.
    Shape: one two-phase count over the corpus into |strata| rows; the
    totals come from an empty-partition window OVER THE STRATA FRAME —
    a single-partition exchange of |sources|×|langs| rows at any corpus
    size, so the corpus is scanned exactly once (scalar subqueries over
    the lazy strata plan would have re-aggregated it per subquery).
    Pairs with sample_stratified_det, which APPLIES a schedule like
    this scan-side."""
    docs = load(spark, sf_dir, "documents")
    n = token_count("text")
    s = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n).alias("n_tokens"),
    )
    w = s.withColumn(
        "weight_u",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000).cast(
            "bigint"
        ),
    )
    return w.select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        "weight_u",
        F.expr(
            "CAST((n_tokens * 1000000) div (SUM(n_tokens) OVER ()) AS BIGINT)"
        ).alias("share_ppm"),
        F.expr(
            "CAST((10000 * weight_u) div (SUM(weight_u) OVER ()) AS BIGINT)"
        ).alias("quota_docs"),
    )
