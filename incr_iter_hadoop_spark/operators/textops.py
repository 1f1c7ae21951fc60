"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting (BASELINE.json north star; LLM-pipeline surface).

All deterministic column expressions so the DuckDB oracle can mirror them
bit-for-bit; regexp/string builtins only — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread_scan
from ..functions.text import EN_STOPWORDS, token_ngrams, ws_tokens
from ..registry import register

_STOPS_SQL = "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"


def _toks(text):
    return ws_tokens(text)


@register(
    "text_token_stats",
    oracle="""
    WITH t AS (
      SELECT source,
             len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
               AS tok
      FROM documents
    )
    SELECT source,
           CAST(SUM(tok) AS BIGINT) AS total_tokens,
           ROUND(AVG(tok), 6) AS avg_tokens,
           CAST(MAX(tok) AS BIGINT) AS max_tokens
    FROM t GROUP BY source
    """,
    doc="token counting per corpus source (whitespace tokenizer).",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = F.size(_toks(F.col("text")))
    return (
        d.select("source", tok.alias("tok"))
        .groupBy("source")
        .agg(
            F.sum("tok").cast("bigint").alias("total_tokens"),
            F.round(F.avg("tok"), 6).alias("avg_tokens"),
            F.max("tok").cast("bigint").alias("max_tokens"),
        )
    )


@register(
    "text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS w,
             length(text) AS n_chars_raw
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(w) AS tok_cnt,
             len(list_filter(w, x -> lower(x) IN {_STOPS_SQL}))::DOUBLE
               / len(w) AS stop_ratio_raw,
             (SELECT COALESCE(SUM(length(x)), 0) FROM unnest(w) AS u(x))::DOUBLE
               / len(w) AS mean_tok_raw
      FROM t WHERE len(w) > 0
    )
    SELECT doc_id,
           CAST(tok_cnt AS BIGINT) AS tok_cnt,
           ROUND(stop_ratio_raw, 6) AS stop_ratio,
           ROUND(mean_tok_raw, 6) AS mean_tok_len,
           ROUND(LEAST(1.0, tok_cnt / 100.0) * 0.5 + stop_ratio_raw * 0.5, 6)
             AS quality
    FROM m
    """,
    doc="document quality scoring: token count, stopword ratio, mean token "
    "length, composite score.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    w = _toks(F.col("text"))
    tok_cnt = F.size(w)
    stops = F.size(F.filter(w, lambda t: F.lower(t).isin(*EN_STOPWORDS)))
    stop_ratio = stops.cast("double") / tok_cnt
    total_len = F.aggregate(w, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_tok = total_len.cast("double") / tok_cnt
    quality = F.least(F.lit(1.0), tok_cnt / 100.0) * 0.5 + stop_ratio * 0.5
    return (
        d.select(
            "doc_id",
            tok_cnt.cast("bigint").alias("tok_cnt"),
            F.round(stop_ratio, 6).alias("stop_ratio"),
            F.round(mean_tok, 6).alias("mean_tok_len"),
            F.round(quality, 6).alias("quality"),
        )
        .where(F.col("tok_cnt") > 0)
    )


@register(
    "text_lang_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
      FROM documents
    )
    SELECT CASE WHEN len(list_filter(w, x -> lower(x) IN {_STOPS_SQL}))::DOUBLE
                     / len(w) >= 0.08
                THEN 'en' ELSE 'other' END AS lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM t WHERE len(w) > 0 GROUP BY 1
    """,
    doc="language-ID heuristic (stopword-density n-gram proxy); counts per "
    "predicted language.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = _toks(F.col("text"))
    stops = F.size(F.filter(w, lambda t: F.lower(t).isin(*EN_STOPWORDS)))
    ratio = stops.cast("double") / F.size(w)
    return (
        d.select(F.when(ratio >= 0.08, "en").otherwise("other").alias("lang_pred"))
        .where(F.size(w) > 0)
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_regex_tokens",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
               AS n_bpe
      FROM documents
    )
    SELECT CAST(SUM(n_bpe) AS BIGINT) AS total_tokens,
           CAST(MAX(n_bpe) AS BIGINT) AS max_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM t
    """,
    doc="BPE-ish token counting: pre-tokenizer regex (letter runs / digit "
    "runs / single punctuation — the GPT-2-style split shape) counted "
    "JVM-side via regexp_extract_all.",
)
def text_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n = F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
    return d.select(n.alias("n_bpe")).agg(
        F.sum("n_bpe").cast("bigint").alias("total_tokens"),
        F.max("n_bpe").cast("bigint").alias("max_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
    doc="document fingerprint: md5 of casefolded whitespace-normalized text "
    "(deterministic rolling-hash analogue).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("fp"),
    )


_CHUNK_W, _CHUNK_S = 64, 48  # window / stride (16-token overlap)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = _CHUNK_W,
    stride: int = _CHUNK_S,
) -> DataFrame:
    """Sequence packing: split each document into overlapping ``window``-token
    chunks every ``stride`` tokens — the preprocessing step that turns a
    corpus into fixed-context training sequences. Pure array expressions
    (sequence -> explode -> slice): the explode fans out inside the scan
    stage, no Python and no shuffle until whatever aggregation follows.
    Output: (doc_id, chunk_id, n_tokens, chunk_hash) — the hash stands in
    for the chunk text so results stay small but content-checkable."""
    w = _toks(F.col(text_col))
    out = (
        df.select(F.col(id_col).alias("doc_id"), w.alias("w"))
        .where(F.size("w") > 0)
        .select(
            "doc_id",
            "w",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size("w") - 1) / stride).cast("int"),
                )
            ).alias("k"),
        )
        .select(
            "doc_id",
            F.col("k").cast("int").alias("chunk_id"),
            F.slice("w", F.col("k") * stride + 1, window).alias("chunk"),
        )
    )
    return out.select(
        "doc_id",
        "chunk_id",
        F.size("chunk").cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "chunk")).alias("chunk_hash"),
    )


@register(
    "text_chunk_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
      FROM documents
    ), c AS (
      SELECT doc_id, w,
             unnest(range(((len(w) - 1) // {_CHUNK_S}) + 1)) AS k
      FROM t WHERE len(w) > 0
    )
    SELECT doc_id,
           CAST(k AS INT) AS chunk_id,
           CAST(len(w[k * {_CHUNK_S} + 1 :
                     LEAST(k * {_CHUNK_S} + {_CHUNK_W}, len(w))]) AS BIGINT)
             AS n_tokens,
           md5(array_to_string(
                 w[k * {_CHUNK_S} + 1 :
                   LEAST(k * {_CHUNK_S} + {_CHUNK_W}, len(w))], ' '))
             AS chunk_hash
    FROM c
    """,
    doc=f"sequence packing for training: {_CHUNK_W}-token chunks every "
    f"{_CHUNK_S} tokens ({_CHUNK_W - _CHUNK_S}-token overlap) per document "
    "— sequence/explode/slice column expressions only; chunk content "
    "checked via md5 so the oracle compares every chunk boundary exactly.",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d)


@register(
    "text_repetition_quality",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      FROM documents
    ),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    tstats AS (
      SELECT doc_id, count(*) AS d, max(c) AS mx, sum(c) AS n
      FROM tc GROUP BY 1
    ),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS big
      FROM t
    ),
    bc AS (SELECT doc_id, big, count(*) AS c FROM big GROUP BY 1, 2),
    bstats AS (SELECT doc_id, max(c) AS bmx, sum(c) AS bn FROM bc GROUP BY 1)
    SELECT s.doc_id,
           CAST(s.n AS BIGINT) AS n_tokens,
           ROUND(s.d / CAST(s.n AS DOUBLE), 6) AS distinct_ratio,
           ROUND(s.mx / CAST(s.n AS DOUBLE), 6) AS top_token_frac,
           ROUND(b.bmx / CAST(b.bn AS DOUBLE), 6) AS top_bigram_frac
    FROM tstats s JOIN bstats b USING (doc_id)
    """,
    doc="repetition-based quality signals (the Gopher/C4 repetition rules): "
    "distinct-token ratio, most-frequent-token fraction, most-frequent-"
    "bigram fraction per document. Computed ENTIRELY map-side with array "
    "higher-order functions (array_distinct/transform/filter/zip_with) — "
    "zero shuffles, so at 100 TB it rides the scan; the unnest+groupBy "
    "formulation (what the oracle uses) would shuffle |tokens| rows. "
    "Per-doc cost is O(distinct·n) — fine for LLM-pipeline docs (<=100k "
    "tokens); switch to the explode form for pathological single-doc sizes.",
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    t = (
        d.select("doc_id", _toks(F.col("text")).alias("toks"))
        .withColumn("n", F.size("toks"))
        # Docs need >= 2 tokens to have a bigram: the oracle's inner JOIN on
        # bstats drops 0/1-token docs, and slice(toks, 1, n - 1) would throw
        # on a negative length for an empty doc — filter them identically.
        .where(F.col("n") >= 2)
        .withColumn(
            "bigs",
            F.expr(
                "zip_with(slice(toks, 1, n - 1), slice(toks, 2, n - 1),"
                " (x, y) -> concat(x, ' ', y))"
            ),
        )
    )
    top_of = (
        "array_max(transform(array_distinct({0}),"
        " t -> size(filter({0}, x -> x = t))))"
    )
    return t.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct("toks")) / F.col("n").cast("double"), 6
        ).alias("distinct_ratio"),
        F.round(
            F.expr(top_of.format("toks")) / F.col("n").cast("double"), 6
        ).alias("top_token_frac"),
        F.round(
            F.expr(top_of.format("bigs")) / (F.col("n") - 1).cast("double"), 6
        ).alias("top_bigram_frac"),
    )


@register(
    "corpus_top_tokens",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(trim(text), ' '), x -> x <> ''))
        AS tok
      FROM documents
    )
    SELECT tok, CAST(count(*) AS BIGINT) AS n
    FROM tok GROUP BY 1 ORDER BY n DESC, tok ASC LIMIT 100
    """,
    doc="exact corpus-wide vocabulary heavy hitters: top-100 tokens by "
    "count (vocab building / BPE seeding). Explode → map-side partial "
    "count → one shuffle on token → TakeOrderedAndProject (never a global "
    "sort); ordering is (count DESC, token ASC) — integer-deterministic, "
    "no float tie risk.",
)
def corpus_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_toks(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(100)
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      FROM documents
    ),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    n AS (SELECT doc_id, sum(c) AS n FROM tc GROUP BY 1),
    df AS (SELECT tok, count(*) AS df FROM tc GROUP BY 1),
    total AS (SELECT count(*) AS nd FROM t),
    ranked AS (
      SELECT tc.doc_id, tc.tok, tc.c, df.df, n.n, total.nd,
             row_number() OVER (
               PARTITION BY tc.doc_id
               ORDER BY tc.c DESC, df.df ASC, tc.tok ASC
             ) AS rk
      FROM tc JOIN df USING (tok) JOIN n USING (doc_id) CROSS JOIN total
    )
    SELECT doc_id, CAST(rk AS INT) AS rank, tok,
           CAST(c AS BIGINT) AS tf_count,
           CAST(df AS BIGINT) AS doc_freq,
           ROUND((c / CAST(n AS DOUBLE)) * ln(nd / CAST(df AS DOUBLE)), 6)
             AS tfidf
    FROM ranked WHERE rk <= 3
    """,
    doc="per-document top-3 keywords (keyword extraction): ranked by "
    "(term count DESC, document frequency ASC, token ASC) — an "
    "integer-only ordering so row SELECTION is exactly reproducible "
    "across engines; the float TF-IDF score is reported as a VALUE "
    "column only (rounded, compared at tolerance), never used to pick "
    "rows. Two shuffles (doc-term counts, token df) + a per-doc window; "
    "the df side joins on token and the corpus size broadcast-crosses.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks(F.col("text"))).alias("tok"))
    tc = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    n = tc.groupBy("doc_id").agg(F.sum("c").alias("n"))
    df = tc.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    total = d.agg(F.count(F.lit(1)).alias("nd"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("c").desc(), F.col("df").asc(), F.col("tok").asc()
    )
    return (
        tc.join(F.broadcast(df), "tok")
        .join(n, "doc_id")
        .crossJoin(F.broadcast(total))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "doc_id",
            F.col("rk").cast("int").alias("rank"),
            "tok",
            F.col("c").cast("bigint").alias("tf_count"),
            F.col("df").cast("bigint").alias("doc_freq"),
            F.round(
                (F.col("c") / F.col("n").cast("double"))
                * F.log(F.col("nd") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )


@register(
    "inverted_index_trigrams",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      FROM documents
    ),
    tri AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
      FROM t
    ),
    td AS (SELECT DISTINCT g, doc_id FROM tri),
    df AS (SELECT g, count(*) AS df FROM td GROUP BY 1)
    SELECT t.g AS trigram, CAST(d.df AS BIGINT) AS df,
           string_agg(CAST(t.doc_id AS VARCHAR), ',' ORDER BY t.doc_id)
             AS postings
    FROM td t JOIN df d USING (g) WHERE d.df <= 3
    GROUP BY 1, 2
    """,
    doc="inverted index over RARE trigrams (df <= 3): trigram → sorted "
    "posting list — the retrieval-side structure decontamination and "
    "exact-substring search build on. Distinct (trigram, doc) pairs "
    "shuffle once on trigram; the df cap bounds posting-list size so no "
    "reducer key explodes (the df>cap head of the distribution is "
    "boilerplate, already covered by the repetition/dedup operators). "
    "Postings serialize as a comma-joined NUMERICALLY-sorted id string on "
    "both engines, so the value hash is order-stable.",
)
def inverted_index_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Guard: sequence(1, size - 2) on a < 3-token doc would generate a
    # DESCENDING sequence in Spark (DuckDB's range(lo, hi) is empty when
    # hi <= lo) — filter short docs so both engines see zero trigrams.
    t = d.select("doc_id", _toks(F.col("text")).alias("toks")).where(
        F.size("toks") >= 3
    )
    tri = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1]))"
            )
        ).alias("g"),
    )
    td = tri.distinct()
    return (
        td.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .where(F.col("df") <= 3)
        .select(
            F.col("g").alias("trigram"),
            F.col("df").cast("bigint").alias("df"),
            "postings",
        )
    )

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{4}\b"


@register(
    "text_pii_redact",
    oracle=r"""
    WITH injected AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
               AS itext
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(itext,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(itext, '\b\d{3}-\d{4}\b')) AS BIGINT)
             AS n_phones,
           md5(regexp_replace(regexp_replace(itext,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '\b\d{3}-\d{4}\b', '<PHONE>', 'g')) AS redacted_md5
    FROM injected
    """,
    doc="PII redaction (LLM-pipeline scrubbing pass): mask email- and "
    "phone-shaped spans and count the redactions per document. The corpus "
    "is synthetic, so a deterministic email+phone is first INJECTED per "
    "doc (derived from doc_id) to make the redaction non-degenerate; both "
    "engines apply the identical injection. Pure regexp column "
    "expressions — map-side only, zero shuffles, rides the scan at "
    "100 TB. The regex subset used (char classes, \\d, \\b, {m,}) "
    "behaves identically in Java regex and RE2. Redacted text is emitted "
    "as an md5 so the driver hash checks content without shipping it.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    itext = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(itext, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(itext, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(itext, F.lit(_PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


# shared unigram-LM CTE prefix (tok/vocab/tot/lp) — ONE template so the
# quality-score query and the bucketed sampler built on it cannot
# desynchronize (the _para_oracle precedent)
UNIGRAM_LP_SQL = """
    tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(trim(text), ' '),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT sum(c)::DOUBLE AS n FROM vocab),
    lp AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             ROUND(avg(ln(v.c / tot.n)), 6) AS avg_logprob
      FROM tok t JOIN vocab v USING (tok), tot
      GROUP BY t.doc_id
    )"""


def unigram_logprob_df(d: DataFrame) -> DataFrame:
    """Per-doc (doc_id, n_tokens, avg_logprob) under the corpus's own
    unigram frequency distribution — the Spark half of UNIGRAM_LP_SQL."""
    tok = d.select("doc_id", F.explode(_toks(F.col("text"))).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").cast("double").alias("n"))
    return (
        tok.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("n"))), 6).alias(
                "avg_logprob"
            ),
        )
    )


@register(
    "text_unigram_logprob",
    oracle=f"""
    WITH {UNIGRAM_LP_SQL}
    SELECT doc_id, n_tokens, avg_logprob FROM lp
    """,
    doc="perplexity-proxy quality score (unigram LM): mean log-probability "
    "of each document's tokens under the corpus's own unigram frequency "
    "distribution — the classic cheap fluency/quality filter (gibberish "
    "and boilerplate score far from the corpus mode). Two shuffles at "
    "scale: one groupBy(token) for the frequency table, one groupBy(doc) "
    "for the per-doc mean; the frequency join shuffles on token (or "
    "broadcasts when the vocabulary is small — AQE decides). The corpus "
    "total rides a broadcast cross join of a 1-row aggregate.",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return unigram_logprob_df(d)


@register(
    "bpe_pair_counts",
    oracle=r"""
    WITH tok AS (
      SELECT unnest(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS t
      FROM documents
    ), pairs AS (
      SELECT unnest([substr(t, CAST(i AS INTEGER), 2)
                     for i in range(1, length(t))]) AS pair
      FROM tok WHERE length(t) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 50
    """,
    doc="BPE merge-step statistics: counts of ADJACENT SYMBOL PAIRS within "
    "pre-tokenizer units (the quantity byte-pair-encoding training "
    "maximizes at each merge), top-50 by count. Pair generation is a "
    "map-side array comprehension over each token (no Python, no extra "
    "shuffle); the count is one partial-agg shuffle on the pair key and "
    "the top-50 compiles to TakeOrderedAndProject. Ordering (count DESC, "
    "pair ASC) is integer-deterministic.",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.regexp_extract_all(
                "text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
            )
        ).alias("t")
    ).where(F.length("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 1),
                lambda i: F.col("t").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(50)
    )


@register(
    "tokenize_to_ids",
    oracle="""
    WITH t AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      FROM documents
    ), tokx AS (
      SELECT doc_id, unnest(toks) AS tok FROM t
    ), vocab AS (
      SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC)
                       AS BIGINT) AS id
      FROM tokx GROUP BY tok ORDER BY COUNT(*) DESC, tok ASC LIMIT 100
    ), pos AS (
      SELECT doc_id, unnest(range(1, len(toks) + 1)) AS p, toks
      FROM t WHERE len(toks) > 0
    ), enc AS (
      SELECT pos.doc_id, pos.p, COALESCE(vocab.id, 0) AS id
      FROM pos LEFT JOIN vocab ON vocab.tok = pos.toks[CAST(pos.p AS INTEGER)]
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY p)) AS ids_md5
    FROM enc GROUP BY doc_id
    """,
    doc="dictionary-encode text to token ids — the text→ids step of "
    "training-data prep: vocab = top-100 corpus tokens (id = rank, "
    "integer-deterministic order), every doc token mapped via a BROADCAST "
    "dictionary join (the 100 TB shape: the vocab is small and ships to "
    "every executor; the corpus never reshuffles), OOV → id 0. Output "
    "keeps the result bounded: per-doc token/OOV counts + an md5 "
    "fingerprint of the exact id sequence, so the full encoding is "
    "value-checked without materializing it.",
)
def tokenize_to_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", ws_tokens(F.col("text")).alias("toks"))
    tokx = t.select(F.explode("toks").alias("tok"))
    vocab = (
        tokx.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(100)
    )
    from pyspark.sql.window import Window

    vocab = vocab.select(
        "tok",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("tok").asc()))
        .cast("bigint")
        .alias("id"),
    )
    pos = t.where(F.size("toks") > 0).select(
        "doc_id", F.posexplode("toks").alias("p", "tok")
    )
    enc = pos.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id", "p", F.coalesce("id", F.lit(0)).alias("id")
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((F.col("id") == 0).cast("bigint")).alias("n_oov"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "id"))),
                    lambda s: s["id"].cast("string"),
                ),
            )
        ).alias("ids_md5"),
    )


_PACK_LEN = 512  # tokens per packed training example
_PACK_STREAMS = 16  # parallel packing streams (per-stream order is the
# inherently sequential part of concat-and-split packing; streams scale out)


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               % {_PACK_STREAMS} AS stream,
             md5(CAST(doc_id AS VARCHAR)) AS okey,
             len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
               AS tok
      FROM documents
    ), c AS (
      SELECT stream, doc_id, tok,
             SUM(tok) OVER (PARTITION BY stream ORDER BY okey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok
               AS start_off
      FROM t
    )
    SELECT stream,
           CAST(start_off // {_PACK_LEN} AS BIGINT) AS example_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens
    FROM c GROUP BY 1, 2
    """,
    doc="sequence packing (concat-and-split): docs are concatenated in a "
    f"deterministic md5 order within {_PACK_STREAMS} parallel packing "
    f"streams and cut into {_PACK_LEN}-token training examples; each doc "
    "is assigned to the example containing its first token. The only "
    "sequential dependency — the running token offset — is confined to "
    "one window per stream, and streams scale with the cluster; "
    "assignment is reproducible on any executor count (pure function of "
    "doc_id + token counts). Output: per-example doc and token tallies.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from .sampling import shard_assignment

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        shard_assignment(F.col("doc_id"), _PACK_STREAMS).alias("stream"),
        F.md5(F.col("doc_id").cast("string")).alias("okey"),
        F.size(ws_tokens(F.col("text"))).alias("tok"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy("okey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("start_off", F.sum("tok").over(w) - F.col("tok"))
    return (
        c.groupBy(
            "stream",
            F.floor(F.col("start_off") / _PACK_LEN).alias("example_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").cast("bigint").alias("n_tokens"),
        )
    )


_BM25_K1 = 1.2
_BM25_B = 0.75
# fixed query workload (terms exist in the synthetic corpus vocabulary)
_BM25_QUERIES = [
    (0, ("table", "scan")),
    (1, ("window", "batch")),
    (2, ("vector", "hash", "join")),
]


@register(
    "bm25_scores",
    oracle=f"""
    WITH q(query_id, term) AS (VALUES {", ".join(
        f"({qid}, '{t}')" for qid, ts in _BM25_QUERIES for t in ts)}),
    t AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      FROM documents
    ),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    stats AS (SELECT COUNT(*) AS n, AVG(len(toks)) AS avgdl FROM t),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok
      WHERE term IN (SELECT term FROM q) GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
               * tf.tf * ({_BM25_K1} + 1)
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                  + {_BM25_B} * dl.dl / stats.avgdl)) AS s
      FROM q JOIN tf USING (term)
      JOIN df ON df.term = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    )
    SELECT query_id, doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND(SUM(s), 6) AS bm25
    FROM scored GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
    doc="BM25 retrieval scoring (Lucene's +1-idf variant, k1=1.2 b=0.75) "
    "for a fixed query workload — the corpus-search primitive of "
    "training-data curation. The query-term relation broadcasts (tiny); "
    "tf is computed ONLY for query terms (the IN filter prunes the "
    "explode before the shuffle); df/avgdl are corpus statistics from "
    "the same pass. Row SELECTION is integer-only (docs matching ≥ 2 "
    "distinct query terms) so float rounding can never change the result "
    "set — the BM25 score itself is a tolerance-compared value column.",
)
def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        [(qid, t) for qid, ts in _BM25_QUERIES for t in ts],
        "query_id int, term string",
    )
    t = d.select("doc_id", ws_tokens(F.col("text")).alias("toks"))
    dl = t.select("doc_id", F.size("toks").alias("dl"))
    stats = t.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.size("toks")).alias("avgdl")
    )
    tok = t.select("doc_id", F.explode("toks").alias("term"))
    all_terms = sorted({t_ for _, ts in _BM25_QUERIES for t_ in ts})
    tf = (
        tok.where(F.col("term").isin(all_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        F.broadcast(q)
        .join(tf, "term")
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1
                )
                * F.col("tf")
                * (_BM25_K1 + 1)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (
                        1
                        - _BM25_B
                        + _BM25_B * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("s"),
        )
    )
    return (
        scored.groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("s"), 6).alias("bm25"),
        )
        .where(F.col("n_terms") >= 2)
    )


def _ngrams(w, n: int):
    """Token n-gram multiset — delegates to the ONE guarded builder
    (functions/text.token_ngrams; r9 consolidation of three independent
    copies of the transform+slice construction and its sequence(1,0)-
    descends guard)."""
    return token_ngrams(w, n)


def _multiset_dup_stats(arr):
    """(n, dup_n, chars, dup_chars) over a string multiset — the
    Gopher/Dolma duplicate-fraction accounting where EVERY occurrence of
    a value with count > 1 is "duplicate" (a line appearing 3× counts 3,
    not 2). Map-only: ``array_sort`` once, then ONE ``F.aggregate`` fold
    walks the sorted array tracking the current equal-run (value, run
    length, run chars) and flushes runs of >= 2 into the duplicate
    totals — O(n log n) per document, zero shuffle, zero Python.

    The fold shape is load-bearing, not style: HOF lambdas evaluate
    INTERPRETED (no whole-stage codegen, no common-subexpression
    elimination), so the more natural sorted-NEIGHBOR mask —
    ``transform(srt, (x, i) -> x == get(srt, i ± 1))`` — re-evaluates
    the full ``array_sort(transform(...))`` expression once PER ELEMENT,
    turning the per-row cost quadratic (measured: 25.8s for 5000 ×
    ~27-chunk docs at sf0.1; this fold: sub-second). The sorted array is
    referenced exactly once here."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("runchars"),
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("chars"),
        F.lit(0).cast("long").alias("dup_n"),
        F.lit(0).cast("long").alias("dup_chars"),
        F.lit(0).cast("long").alias("groups"),
        F.lit(0).cast("long").alias("max_run"),
    )

    def step(acc, x):
        same = F.coalesce(x == acc["prev"], F.lit(False))
        flush = (~same) & (acc["run"] >= 2)  # a closing run of dups
        ln = F.length(x).cast("long")
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(same, acc["runchars"] + ln).otherwise(ln).alias(
                "runchars"
            ),
            (acc["n"] + 1).alias("n"),
            (acc["chars"] + ln).alias("chars"),
            F.when(flush, acc["dup_n"] + acc["run"])
            .otherwise(acc["dup_n"])
            .alias("dup_n"),
            F.when(flush, acc["dup_chars"] + acc["runchars"])
            .otherwise(acc["dup_chars"])
            .alias("dup_chars"),
            # distinct-value count: one increment per run start
            F.when(same, acc["groups"]).otherwise(acc["groups"] + 1).alias(
                "groups"
            ),
            # top multiplicity: runs close on a value change
            F.when(same, acc["max_run"])
            .otherwise(F.greatest(acc["max_run"], acc["run"]))
            .alias("max_run"),
        )

    def finish(acc):
        last = acc["run"] >= 2  # flush the trailing run
        return F.struct(
            acc["n"].alias("n"),
            F.when(last, acc["dup_n"] + acc["run"])
            .otherwise(acc["dup_n"])
            .alias("dup_n"),
            acc["chars"].alias("chars"),
            F.when(last, acc["dup_chars"] + acc["runchars"])
            .otherwise(acc["dup_chars"])
            .alias("dup_chars"),
            acc["groups"].alias("groups"),
            F.greatest(acc["max_run"], acc["run"]).alias("max_run"),
        )

    return F.aggregate(F.array_sort(arr), zero, step, finish)


def gopher_dup_lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher duplicate-line / duplicate-paragraph fractions over REAL
    newline-structured text (Rae et al. 2021 A1.1, the Dolma/NeMo
    formulas): lines split on '\\n', paragraphs on '\\n\\n',
    whitespace-only segments dropped; per doc, the count-weighted
    fraction of segments whose value occurs more than once and the
    character-weighted twin (chars in such segments / total segment
    chars). Documents with no non-blank lines are dropped. Map-only —
    see ``_multiset_dup_stats``."""

    def segs(sep: str):
        # blank = contains no non-whitespace char, matching Python
        # str.strip() semantics: F.trim strips only ASCII spaces (a
        # paragraph segment like "\n  " would survive), and Java's bare
        # \s is ASCII-only (an NBSP-only segment would survive) — the
        # (?U) flag makes \S Unicode-aware (\p{IsWhite_Space}), aligning
        # with Python for all Unicode whitespace; the residual gap is
        # the U+001C-1F separators (Python isspace, not IsWhite_Space),
        # accepted as out of contract (r10 review)
        return F.filter(
            F.split(F.col(text_col), sep), lambda x: x.rlike(r"(?U)\S")
        )

    base = df.select(
        F.col(id_col).alias("id"),
        _multiset_dup_stats(segs("\n")).alias("ls"),
        _multiset_dup_stats(segs("\n\n")).alias("ps"),
    ).where(F.col("ls.n") > 0)
    return base.select(
        "id",
        F.col("ls.n").alias("n_lines"),
        F.col("ps.n").alias("n_paras"),
        (F.col("ls.dup_n") / F.col("ls.n")).alias("dup_line_frac"),
        (F.col("ls.dup_chars") / F.col("ls.chars")).alias(
            "dup_line_char_frac"
        ),
        (F.col("ps.dup_n") / F.col("ps.n")).alias("dup_para_frac"),
        (F.col("ps.dup_chars") / F.col("ps.chars")).alias(
            "dup_para_char_frac"
        ),
    )


@register(
    "text_dup_line_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
      FROM documents
    ), arrs AS (
      SELECT doc_id,
             list_transform(range(1, len(w) + 1, 2),
                            i -> array_to_string(w[i:i+1], ' ')) AS lines,
             list_transform(range(1, len(w) + 1, 3),
                            i -> array_to_string(w[i:i+2], ' ')) AS paras
      FROM t WHERE len(w) > 0
    ), lc AS (
      SELECT doc_id, line, COUNT(*) AS cnt, length(line) AS ln
      FROM (SELECT doc_id, unnest(lines) AS line FROM arrs)
      GROUP BY doc_id, line
    ), ls AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_lines,
             SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE
               / SUM(cnt) AS dlf,
             SUM(CASE WHEN cnt > 1 THEN cnt * ln ELSE 0 END)::DOUBLE
               / SUM(cnt * ln) AS dlcf
      FROM lc GROUP BY doc_id
    ), pc AS (
      SELECT doc_id, para, COUNT(*) AS cnt, length(para) AS ln
      FROM (SELECT doc_id, unnest(paras) AS para FROM arrs)
      GROUP BY doc_id, para
    ), ps AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_paras,
             SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE
               / SUM(cnt) AS dpf,
             SUM(CASE WHEN cnt > 1 THEN cnt * ln ELSE 0 END)::DOUBLE
               / SUM(cnt * ln) AS dpcf
      FROM pc GROUP BY doc_id
    )
    SELECT ls.doc_id, n_lines, n_paras,
           ROUND(dlf, 6) AS dup_line_frac,
           ROUND(dlcf, 6) AS dup_line_char_frac,
           ROUND(dpf, 6) AS dup_para_frac,
           ROUND(dpcf, 6) AS dup_para_char_frac,
           dlf <= 0.30 AND dpf <= 0.30 AND dlcf <= 0.20 AND dpcf <= 0.20
             AS keep
    FROM ls JOIN ps ON ls.doc_id = ps.doc_id
    """,
    doc="Gopher duplicate-LINE / duplicate-PARAGRAPH fractions (round 10 "
    "— the third and final Gopher repetition rule family: "
    "text_repetition_quality covers top-frequency signals, "
    "text_repetition_stats the dup n-gram fractions, this one the "
    "dup-line/paragraph fractions, count- AND character-weighted, with "
    "the Rae et al. A1.1 keep thresholds 0.30/0.30/0.20/0.20). The sf "
    "corpora carry no newlines, so the registered query synthesizes a "
    "deterministic segment structure IDENTICALLY on both engines — "
    "lines = consecutive 2-token chunks, paragraphs = 3-token chunks "
    "(3 keeps the paragraph stat non-vacuous on the sf vocab) — "
    "while the real '\\n'/'\\n\\n' split path (gopher_dup_lines) is "
    "pinned against a pure-Python reference on hostile newline docs in "
    "tests/test_dup_line_stats.py. Dolma-faithful accounting: every "
    "occurrence of a repeated segment counts as duplicate. Map-only "
    "sorted-neighbor formulation — zero shuffle (the explode+groupBy "
    "alternative shuffles every line of a 100 TB corpus); the oracle "
    "uses that explode+groupBy form precisely because it is the "
    "independent formulation of the same statistic.",
)
def text_dup_line_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    w = _toks(F.col("text"))
    base = d.select("doc_id", w.alias("w")).where(F.size("w") > 0)

    def chunks(width: int):
        return F.transform(
            F.sequence(F.lit(1), F.size("w"), F.lit(width)),
            lambda i: F.array_join(F.slice("w", i, width), " "),
        )

    g = base.select(
        "doc_id",
        _multiset_dup_stats(chunks(2)).alias("ls"),
        _multiset_dup_stats(chunks(3)).alias("ps"),
    )
    dlf = F.col("ls.dup_n") / F.col("ls.n")
    dlcf = F.col("ls.dup_chars") / F.col("ls.chars")
    dpf = F.col("ps.dup_n") / F.col("ps.n")
    dpcf = F.col("ps.dup_chars") / F.col("ps.chars")
    return g.select(
        "doc_id",
        F.col("ls.n").alias("n_lines"),
        F.col("ps.n").alias("n_paras"),
        F.round(dlf, 6).alias("dup_line_frac"),
        F.round(dlcf, 6).alias("dup_line_char_frac"),
        F.round(dpf, 6).alias("dup_para_frac"),
        F.round(dpcf, 6).alias("dup_para_char_frac"),
        (
            (dlf <= 0.30) & (dpf <= 0.30) & (dlcf <= 0.20) & (dpcf <= 0.20)
        ).alias("keep"),
    )


@register(
    "text_gopher_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
      FROM documents
    ), b AS (
      SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) > 0
    ), base AS (
      SELECT doc_id, n,
             (SELECT COALESCE(SUM(length(x)), 0)
              FROM unnest(w) AS u(x))::DOUBLE / n AS mean_len,
             len(list_distinct(
               list_filter(w, x -> lower(x) IN {_STOPS_SQL}))) AS n_stop,
             CASE WHEN len(w) >= 2 THEN 1.0 - len(list_distinct(
               list_transform(range(1, len(w)),
                 i -> array_to_string(w[i:i+1], ' '))))::DOUBLE
               / (len(w) - 1) ELSE 0.0 END AS dup2,
             CASE WHEN len(w) >= 3 THEN 1.0 - len(list_distinct(
               list_transform(range(1, len(w) - 1),
                 i -> array_to_string(w[i:i+2], ' '))))::DOUBLE
               / (len(w) - 2) ELSE 0.0 END AS dup3
      FROM b
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
               i -> array_to_string(w[i:i+1], ' '))) AS big
      FROM b
    ), bc AS (
      SELECT doc_id, big, COUNT(*) AS c FROM bg GROUP BY doc_id, big
    ), btop AS (
      SELECT doc_id, MAX(c)::DOUBLE / SUM(c) AS top_bigram FROM bc
      GROUP BY doc_id
    ), lseg AS (
      SELECT doc_id, seg, COUNT(*) AS cnt, length(seg) AS ln
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, len(w) + 1, 2),
                     i -> array_to_string(w[i:i+1], ' '))) AS seg
            FROM b)
      GROUP BY doc_id, seg
    ), ls AS (
      SELECT doc_id,
             SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE
               / SUM(cnt) AS dlf,
             SUM(CASE WHEN cnt > 1 THEN cnt * ln ELSE 0 END)::DOUBLE
               / SUM(cnt * ln) AS dlcf
      FROM lseg GROUP BY doc_id
    ), pseg AS (
      SELECT doc_id, seg, COUNT(*) AS cnt, length(seg) AS ln
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, len(w) + 1, 3),
                     i -> array_to_string(w[i:i+2], ' '))) AS seg
            FROM b)
      GROUP BY doc_id, seg
    ), ps AS (
      SELECT doc_id,
             SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE
               / SUM(cnt) AS dpf,
             SUM(CASE WHEN cnt > 1 THEN cnt * ln ELSE 0 END)::DOUBLE
               / SUM(cnt * ln) AS dpcf
      FROM pseg GROUP BY doc_id
    ), rules AS (
      SELECT base.doc_id, base.n,
             CASE WHEN base.n BETWEEN 50 AND 100000 THEN 0 ELSE 1 END
           + CASE WHEN mean_len >= 3 AND mean_len <= 10 THEN 0 ELSE 1 END
           + CASE WHEN n_stop >= 2 THEN 0 ELSE 1 END
           + CASE WHEN COALESCE(top_bigram, 0) <= 0.20 THEN 0 ELSE 1 END
           + CASE WHEN dup2 <= 0.35 THEN 0 ELSE 1 END
           + CASE WHEN dup3 <= 0.20 THEN 0 ELSE 1 END
           + CASE WHEN dlf <= 0.30 THEN 0 ELSE 1 END
           + CASE WHEN dlcf <= 0.20 THEN 0 ELSE 1 END
           + CASE WHEN dpf <= 0.30 THEN 0 ELSE 1 END
           + CASE WHEN dpcf <= 0.20 THEN 0 ELSE 1 END AS n_failed
      FROM base
      LEFT JOIN btop ON btop.doc_id = base.doc_id
      JOIN ls ON ls.doc_id = base.doc_id
      JOIN ps ON ps.doc_id = base.doc_id
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(n_failed AS BIGINT) AS n_failed,
           n_failed = 0 AS keep
    FROM rules
    """,
    doc="the COMPOSED Gopher document filter (round 10 — the pipeline "
    "gate a pretraining user actually runs, fusing every rule family "
    "the engine implements into one keep decision): word count in "
    "[50, 100000], mean word length in [3, 10], >= 2 distinct "
    "stopwords, top-bigram fraction <= 0.20, duplicate 2-/3-gram "
    "fractions <= 0.35/0.20, and the count-/char-weighted duplicate "
    "line (2-token chunks) and paragraph (3-token chunks) fractions "
    "<= 0.30/0.20/0.30/0.20 — Rae et al. A1.1 thresholds throughout. "
    "Output: per-doc failed-rule count + keep. The 100 TB point: every "
    "signal derives from the SAME token array inside one map stage — "
    "ten Gopher rules, ZERO shuffles, plan-pinned Exchange-free — while "
    "the oracle deliberately recomputes each family in the "
    "unnest+groupBy formulation and joins them back (the independent "
    "cross-check). Integer/boolean output only, so no float-rounding "
    "hash hazard; boundary docs (n<2: no bigrams/2-grams) define "
    "repetition evidence as absent (rule passes) identically on both "
    "engines.",
)
def text_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    base = (
        d.select("doc_id", _toks(F.col("text")).alias("w"))
        .where(F.size("w") > 0)
        .withColumn("n", F.size("w"))
    )

    def dup_frac(col):
        return F.when(
            F.size(col) > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(col)).cast("double") / F.size(col),
        ).otherwise(F.lit(0.0))

    def chunks(width: int):
        return F.transform(
            F.sequence(F.lit(1), F.size("w"), F.lit(width)),
            lambda i: F.array_join(F.slice("w", i, width), " "),
        )

    stops = F.size(
        F.array_distinct(
            F.filter("w", lambda t: F.lower(t).isin(*EN_STOPWORDS))
        )
    )
    mean_len = (
        F.aggregate("w", F.lit(0).cast("long"), lambda a, x: a + F.length(x))
        .cast("double")
        / F.col("n")
    )
    # ONE run-length fold over the sorted bigram multiset yields BOTH
    # bigram signals: top_bigram = max multiplicity / count (bs.max_run)
    # and dup2 = 1 - distinct/count (bs.groups) — the per-distinct-value
    # nested filter (O(distinct·n) interpreted) and the second bigram
    # construction via _ngrams are both gone (r10 review)
    sig = base.withColumn(
        "bigs",
        F.when(
            F.col("n") >= 2,
            F.expr(
                "zip_with(slice(w, 1, n - 1), slice(w, 2, n - 1),"
                " (x, y) -> concat(x, ' ', y))"
            ),
        ).otherwise(F.array().cast("array<string>")),
    ).withColumn("bs", _multiset_dup_stats(F.col("bigs"))).select(
        "doc_id",
        "n",
        mean_len.alias("mean_len"),
        stops.alias("n_stop"),
        F.when(
            F.col("bs.n") > 0,
            F.col("bs.max_run").cast("double") / F.col("bs.n"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram"),
        F.when(
            F.col("bs.n") > 0,
            F.lit(1.0) - F.col("bs.groups").cast("double") / F.col("bs.n"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup2"),
        dup_frac(_ngrams(F.col("w"), 3)).alias("dup3"),
        _multiset_dup_stats(chunks(2)).alias("ls"),
        _multiset_dup_stats(chunks(3)).alias("ps"),
    )
    failed = (
        (~F.col("n").between(50, 100000)).cast("long")
        + (~((F.col("mean_len") >= 3) & (F.col("mean_len") <= 10))).cast(
            "long"
        )
        + (F.col("n_stop") < 2).cast("long")
        + (F.col("top_bigram") > 0.20).cast("long")
        + (F.col("dup2") > 0.35).cast("long")
        + (F.col("dup3") > 0.20).cast("long")
        + (F.col("ls.dup_n") / F.col("ls.n") > 0.30).cast("long")
        + (F.col("ls.dup_chars") / F.col("ls.chars") > 0.20).cast("long")
        + (F.col("ps.dup_n") / F.col("ps.n") > 0.30).cast("long")
        + (F.col("ps.dup_chars") / F.col("ps.chars") > 0.20).cast("long")
    )
    return sig.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        failed.alias("n_failed"),
        (failed == 0).alias("keep"),
    )


@register(
    "text_repetition_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
      FROM documents
    ), g AS (
      SELECT doc_id,
             len(w) AS tok_cnt,
             list_transform(range(1, len(w)), i ->
               array_to_string(w[i:i+1], ' ')) AS g2,
             list_transform(range(1, len(w) - 1), i ->
               array_to_string(w[i:i+2], ' ')) AS g3
      FROM t WHERE len(w) > 0
    ), r AS (
      SELECT doc_id, tok_cnt,
             CASE WHEN len(g2) > 0
                  THEN 1.0 - len(list_distinct(g2))::DOUBLE / len(g2)
                  ELSE 0.0 END AS dup2_raw,
             CASE WHEN len(g3) > 0
                  THEN 1.0 - len(list_distinct(g3))::DOUBLE / len(g3)
                  ELSE 0.0 END AS dup3_raw
      FROM g
    )
    SELECT doc_id, CAST(tok_cnt AS BIGINT) AS tok_cnt,
           ROUND(dup2_raw, 6) AS dup_2gram_frac,
           ROUND(dup3_raw, 6) AS dup_3gram_frac,
           dup2_raw <= 0.35 AND dup3_raw <= 0.2 AS keep
    FROM r
    """,
    doc="duplicate-n-gram REPETITION filter (round 9 — the second half of "
    "the Gopher repetition rule family: text_repetition_quality covers "
    "the top-frequency signals (top-token/top-bigram fraction), this one "
    "the DUPLICATE-FRACTION signals — per document, the fraction of "
    "duplicate token 2-grams and 3-grams (1 - distinct/total over the "
    "n-gram multiset) and a Gopher-style keep flag (dup2 <= 0.35 AND "
    "dup3 <= 0.2). A doc can pass one family and fail the other: a "
    "single hot token trips top_token_frac but barely moves dup3, while "
    "a looped paragraph trips dup3 with no dominant token. All JVM-side "
    "array expressions — tokens once, transform+slice n-grams, "
    "array_distinct — zero Python in the row path, map-only at 100 TB "
    "(no shuffle at all). Cross-engine hazards handled: Spark "
    "sequence(1,0) descends (guarded), DuckDB range() is stop-exclusive, "
    "empty/short docs get dup=0, NULL/whitespace-only docs drop on both "
    "sides.",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    w = _toks(F.col("text"))
    base = d.select("doc_id", w.alias("w")).where(F.size("w") > 0)

    def dup_frac(col):
        return F.when(
            F.size(col) > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(col)).cast("double") / F.size(col),
        ).otherwise(F.lit(0.0))

    g = base.select(
        "doc_id",
        F.size("w").cast("bigint").alias("tok_cnt"),
        dup_frac(_ngrams(F.col("w"), 2)).alias("dup2_raw"),
        dup_frac(_ngrams(F.col("w"), 3)).alias("dup3_raw"),
    )
    return g.select(
        "doc_id",
        "tok_cnt",
        F.round("dup2_raw", 6).alias("dup_2gram_frac"),
        F.round("dup3_raw", 6).alias("dup_3gram_frac"),
        ((F.col("dup2_raw") <= 0.35) & (F.col("dup3_raw") <= 0.2)).alias(
            "keep"
        ),
    )


# ---------------------------------------------------------------------------
# fastText-style hashed linear quality classifier (round 13)
# ---------------------------------------------------------------------------

CLF_BUCKETS = 512  # hashed feature space (fastText -bucket, scaled to SF)
_CLF_SEED_W = "ftw"  # weight-table derivation seed
_CLF_SEED_F = "ftf"  # feature-hash seed


def classifier_weights(
    spark: SparkSession, n_buckets: int = CLF_BUCKETS, seed: str = _CLF_SEED_W
) -> DataFrame:
    """(bucket, w) — the model's weight vector as a relation.

    Production shape: a TRAINED weight vector is loaded from wherever the
    trainer wrote it and enters the plan as a broadcast (n_buckets rows —
    2M in fastText's default, still broadcast-sized). For the registered
    demo query the weights are md5-derived integers in [-100, 100] so the
    oracle can rebuild the identical table with zero side-channel config."""
    h = F.substring(
        F.md5(F.concat(F.lit(seed + "|"), F.col("id").cast("string"))), 1, 4
    )
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (F.conv(h, 16, 10).cast("bigint") % 201 - 100).alias("w"),
    )


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = CLF_BUCKETS,
    threshold: int = 0,
) -> DataFrame:
    """Hashed bag-of-ngrams linear classifier (fastText, Joulin et al.
    2016) — the quality-classifier curation gate of the GPT-3/Llama
    pipelines, kept BIGINT-exact so it is oracle-checkable.

    Features = unigrams + space-joined bigrams (the canonical ws_tokens /
    token_ngrams pair), hashed into ``n_buckets`` via the md5-prefix
    convention; score = SUM of the bucket weights (integer margin — a
    trained float model would round-fix its weights the same way);
    keep = margin >= threshold.

    Scale shape: one map (tokenize + hash) → explode → BroadcastHashJoin
    against the weight table → one hash-agg keyed by doc id. The model
    never shuffles; the corpus shuffles once, keyed by id, already
    combined map-side. No Python in the row path."""
    toks = ws_tokens(F.col(text_col))
    feats = F.concat(toks, token_ngrams(toks, 2))
    fh = F.substring(
        F.md5(F.concat(F.lit(_CLF_SEED_F + "|"), F.col("f"))), 1, 4
    )
    fb = docs.select(F.col(id_col), F.explode(feats).alias("f")).select(
        id_col,
        (F.conv(fh, 16, 10).cast("bigint") % n_buckets).alias("bucket"),
    )
    return (
        fb.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("w").cast("bigint").alias("margin"),
        )
        .withColumn("keep", F.col("margin") >= F.lit(threshold))
    )


@register(
    "text_classifier_filter",
    oracle=f"""
    WITH b AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
      FROM documents
    ),
    feats AS (
      SELECT doc_id, unnest(list_concat(w,
        list_transform(range(1, len(w)),
          i -> array_to_string(w[i:i+1], ' ')))) AS f
      FROM b
    ),
    wt AS (
      SELECT CAST(range AS BIGINT) AS bucket,
             ('0x' || substr(md5('{_CLF_SEED_W}|' || CAST(range AS VARCHAR)),
              1, 4))::BIGINT % 201 - 100 AS w
      FROM range({CLF_BUCKETS})
    ),
    fb AS (
      SELECT doc_id,
             ('0x' || substr(md5('{_CLF_SEED_F}|' || f), 1, 4))::BIGINT
               % {CLF_BUCKETS} AS bucket
      FROM feats
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_feats,
           CAST(SUM(wt.w) AS BIGINT) AS margin,
           (SUM(wt.w) >= 0) AS keep
    FROM fb JOIN wt USING (bucket) GROUP BY doc_id
    """,
    doc="hashed linear quality classifier (round 13): the fastText "
    "hashing-trick architecture (unigram + bigram features hashed into "
    f"{CLF_BUCKETS} buckets, linear weight per bucket, sign-of-margin "
    "label) that the GPT-3/Llama curation pipelines run as their "
    "model-based quality gate. Weights enter as a BROADCAST relation "
    "(the production path for a trained vector — never shuffled); the "
    "demo weights are md5-derived integers so margin arithmetic is pure "
    "BIGINT and every doc's (n_feats, margin, keep) is hash-checked "
    "exactly. Plan: map-side tokenize/hash, explode, BroadcastHashJoin, "
    "one doc-keyed hash-agg with map-side partials — the corpus crosses "
    "the wire once at 100 TB.",
)
def text_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    return classifier_score(d, classifier_weights(spark))
