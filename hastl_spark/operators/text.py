"""Text-analysis operators for training-data pipelines over a ``documents``
table (doc_id, text, lang, source, n_chars). Catalyst-native expressions
(whole-stage codegen; no Python in the hot path), each with an
ANSI-SQL-expressible twin used as the DuckDB oracle. Sole exception:
:func:`fingerprint_portable_np`, an Arrow-batched numpy pass that beats
every Catalyst shape measured for the poly-hash fingerprint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword list used by both the quality score and the language guesser;
# counts are computed with the portable (length - length(replace(...)))/len
# trick so the DuckDB oracle can be expression-identical.
EN_MARKERS = [" the ", " and ", " of ", " to ", " in "]
PUNCT = [".", ",", "!", "?", ";", ":"]


def _occurrences(col: Column, needle: str) -> Column:
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def token_count(col: Column) -> Column:
    """Whitespace token count: single-space split, exactly
    len(string_split(text, ' ')) in DuckDB."""
    return F.size(F.split(col, " ", -1))


# BPE-ish pre-tokenizer: a GPT-2-style split simplified to constructs whose
# semantics are identical in Java regex (Spark) and DuckDB's RE2 — ASCII
# contractions, optional-leading-space letter runs, digit runs, punctuation
# runs, residual whitespace. (The real GPT-2 pattern needs lookahead +
# unicode property classes, which RE2 lacks; token COUNTS, the pipeline
# statistic, are what this feeds.)
BPE_ISH_PATTERN = ("'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
                   "| ?[^A-Za-z0-9 ]+| +")


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count: number of BPE_ISH_PATTERN matches. Catalyst
    regexp_count (codegen, no UDF); DuckDB twin:
    len(regexp_extract_all(text, pattern))."""
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc stats: chars, tokens, punctuation count/ratio, stopword ratio,
    mean token length — the quality-scoring feature set."""
    c = F.col(text_col)
    punct_cnt = None
    for p in PUNCT:
        e = _occurrences(c, p)
        punct_cnt = e if punct_cnt is None else punct_cnt + e
    stop_cnt = None
    for s in EN_MARKERS:
        e = _occurrences(c, s)
        stop_cnt = e if stop_cnt is None else stop_cnt + e
    toks = token_count(c)
    return (
        docs.withColumn("chars", F.length(c))
        .withColumn("tokens_ws", toks)
        .withColumn("punct_cnt", punct_cnt.cast("long"))
        .withColumn("punct_ratio", F.round(punct_cnt / F.length(c), 6))
        .withColumn("stopword_cnt", stop_cnt.cast("long"))
        .withColumn("mean_tok_len", F.round((F.length(c) - toks + 1) / toks, 6))
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality heuristic in [0,1]: length band + stopword presence
    + punctuation sanity. Deterministic arithmetic, SQL-expressible."""
    d = with_text_stats(docs, text_col)
    len_ok = F.when((F.col("chars") >= 64) & (F.col("chars") <= 4096), 1.0).otherwise(0.3)
    stop_ok = F.when(F.col("stopword_cnt") >= 1, 1.0).otherwise(0.5)
    punct_ok = F.when(F.col("punct_ratio") <= 0.1, 1.0).otherwise(0.6)
    return d.withColumn("quality", F.round((len_ok + stop_ok + punct_ok) / 3.0, 6))


def lang_guess(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-marker language heuristic: 'en' when English stopword density
    clears a threshold, else 'other'. (The documents fixture carries a lang
    column; this recomputes it from content.)"""
    d = with_text_stats(docs, text_col)
    density = F.col("stopword_cnt") / F.greatest(F.col("tokens_ws"), F.lit(1))
    return d.withColumn(
        "lang_guess", F.when(density >= 0.02, F.lit("en")).otherwise(F.lit("other"))
    )


# scrub patterns restricted to constructs with identical semantics in Java
# regex and DuckDB's RE2 (ASCII classes, {m,} quantifiers, alternation)
URL_PATTERN = "https?://[^ ]+"
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"


def scrub_text(docs: DataFrame, text_col: str = "text",
               out_col: str = "text_scrubbed") -> DataFrame:
    """Training-data text scrubbing: mask URLs and emails, collapse
    whitespace runs, trim. Pure Catalyst regexp_replace chain (codegen);
    DuckDB twin uses regexp_replace(..., 'g')."""
    c = F.col(text_col)
    c = F.regexp_replace(c, URL_PATTERN, "<URL>")
    c = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    c = F.regexp_replace(c, "  +", " ")
    return docs.withColumn(out_col, F.trim(c))


def char_ngrams(docs: DataFrame, n: int = 3, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Explode each doc into its distinct character n-grams (shingles) —
    building block for Jaccard / MinHash dedup. sequence+transform+explode,
    no UDF."""
    c = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))),
        lambda i: F.substr(c, i, F.lit(n)),
    )
    return (
        docs.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("ngram"))
        .filter(F.length("ngram") == n)
    )


POLY_P = 1_000_000_007
# base-31 polynomial string hash — identical integer arithmetic in Spark SQL
# and DuckDB (ascii(), *, %, +), so operators built on it are value-checkable
# against an ANSI-SQL oracle.


def poly_hash_sql(col: str, n: int) -> str:
    """Portable polynomial hash of a length-n string as a SQL expression."""
    terms = " + ".join(
        f"CAST(ascii(substr({col}, {i + 1}, 1)) AS BIGINT) * {31 ** (n - 1 - i)}"
        for i in range(n)
    )
    return f"(({terms}) % {POLY_P})"


def fingerprint_portable(docs: DataFrame, window: int = 8,
                         text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Winnowing-style 1-row document fingerprint: min over the doc's
    ``window``-grams of a portable polynomial hash — the SQL-value-checkable
    twin of :func:`rolling_fingerprint`.

    Unlike :func:`char_ngrams` this explodes WITHOUT array_distinct: min over
    all grams equals min over distinct grams, so the per-gram dedup hashing
    is pure waste here (measured 2.6s -> 2.0s at sf0.1), and the min partial-
    aggregates map-side so the exchange carries one row per doc per
    partition. (A shuffle-free array_min(transform(poly)) variant was tried
    and is ~2x SLOWER: higher-order-function lambdas are interpreted per
    element, while the exploded poly expression runs in whole-stage codegen.)
    """
    if window > 9:
        raise ValueError(
            "fingerprint window > 9 overflows int64 for full-Unicode text "
            "(max poly term sum 0x10FFFF*(31^w-1)/30 exceeds 2^63 at w=10), "
            "and numpy wraparound disagrees with Spark/DuckDB % sign "
            "semantics — use a smaller window or a second hash pass")
    c = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (window - 1), F.lit(1))),
        lambda i: F.substr(c, i, F.lit(window)),
    )
    exploded = (docs.select(F.col(id_col), F.explode(grams).alias("ngram"))
                .filter(F.length("ngram") == window))
    return exploded.groupBy(id_col).agg(
        F.expr(f"min({poly_hash_sql('ngram', window)})").alias("fingerprint")
    )


def fingerprint_portable_np(docs: DataFrame, window: int = 8,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched twin of :func:`fingerprint_portable`: the same poly-hash
    min, but as ONE vectorized numpy pass per document (codepoints via
    utf-32 decode -> sliding-window int64 dot with the 31^k weight vector ->
    mod -> min) instead of exploding ~n_chars rows per doc through a shuffle.
    Value-identical (pinned by test) and ~3x faster at sf0.1: the explode
    materializes millions of 8-char strings and partial-aggregates them;
    here the whole doc is one contiguous int64 array and never leaves the
    executor. Python is justified against the stay-JVM rule because the
    per-element Catalyst alternatives were measured slower (see
    :func:`fingerprint_portable`'s docstring) — this is the Arrow-batched
    escape hatch, not a row-at-a-time UDF."""
    if window > 9:
        raise ValueError(
            "fingerprint window > 9 overflows int64 for full-Unicode text "
            "(max poly term sum 0x10FFFF*(31^w-1)/30 exceeds 2^63 at w=10), "
            "and numpy wraparound disagrees with Spark/DuckDB % sign "
            "semantics — use a smaller window or a second hash pass")
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    w = int(window)
    weights = np.array([31 ** (w - 1 - i) for i in range(w)], dtype=np.int64)
    out_schema = StructType([docs.schema[id_col],
                             StructField("fingerprint", LongType())])

    def fn(batches):
        for pdf in batches:
            ids, fps = [], []
            for did, txt in zip(pdf[id_col].values, pdf[text_col].values):
                if txt is None:
                    continue
                cp = np.frombuffer(txt.encode("utf-32-le"),
                                   dtype=np.uint32).astype(np.int64)
                if cp.size < w:
                    continue  # matches the explode path: no length-w gram
                h = (np.lib.stride_tricks.sliding_window_view(cp, w)
                     @ weights) % POLY_P
                ids.append(did)
                fps.append(int(h.min()))
            yield pd.DataFrame({id_col: ids, "fingerprint": fps})

    return docs.select(id_col, text_col).mapInPandas(fn, out_schema)


def fingerprint_portable_oracle_sql(window: int = 8) -> str:
    """DuckDB twin of :func:`fingerprint_portable`."""
    poly = poly_hash_sql("ngram", window)
    return f"""
        WITH grams AS (
          SELECT DISTINCT doc_id, substr(text, g, {window}) AS ngram
          FROM documents,
               unnest(range(1, greatest(length(text) - {window - 1}, 1) + 1)) AS u(g)
          WHERE length(substr(text, g, {window})) = {window}
        )
        SELECT doc_id, min({poly}) AS fingerprint
        FROM grams GROUP BY doc_id
    """


def rolling_fingerprint(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", window: int = 8) -> DataFrame:
    """Document fingerprint: min of a rolling polynomial hash over
    ``window``-grams (winnowing-style 1-row summary). Catalyst-only:
    aggregate() over the codepoint array."""
    c = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (window - 1), F.lit(1))),
        lambda i: F.xxhash64(F.substr(c, i, F.lit(window))),
    )
    return docs.select(
        F.col(id_col),
        F.array_min(grams).alias("fingerprint"),
    )


def _word_ngrams(text_col: str, n: int):
    """Per-row word n-gram array as a pure Catalyst expression (slice +
    concat_ws — the fastest of three shapes A/B'd at r5, see
    repetition_ratio). Shared by repetition_ratio and vocab_topk so the
    tokenization can never silently diverge between them."""
    words = F.split(F.col(text_col), " ", -1)
    return F.when(
        F.size(words) >= n,
        F.transform(F.sequence(F.lit(1), F.size(words) - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(words, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def repetition_ratio(docs: DataFrame, n: int = 3, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition (Gopher-style quality rule): the fraction
    of word ``n``-grams that are repeats of an earlier n-gram in the same
    document — ``1 - distinct/total`` (0 for docs shorter than n words).

    Scale shape: ZERO shuffles — the n-gram list, distinct-count and ratio
    are all per-row Catalyst array expressions, so the plan is a bare
    projected scan. The document never explodes into per-gram rows.

    Shape A/B'd at sf0.1 (r5): struct-tuple grams (no string alloc) are
    2.6x SLOWER (array_distinct over structs falls back to interpreted
    ordering), per-element ``element_at`` concat 2.2x slower than the
    slice+concat_ws below; the bench number is single-task at toy scale
    (one parquet file) and parallelizes linearly at corpus scale."""
    grams = _word_ngrams(text_col, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return docs.select(
        F.col(id_col),
        total.alias("n_grams"),
        F.when(total > 0,
               F.round(1.0 - distinct / total, 6)).otherwise(0.0)
        .alias("rep_ratio"))


def repetition_ratio_np(docs: DataFrame, n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched twin of :func:`repetition_ratio` (the
    fingerprint_portable_np precedent): the per-row distinct-gram count
    runs as one Python set per document inside ``mapInPandas`` instead of
    Catalyst's interpreted higher-order-function lambdas (transform +
    array_distinct are CodegenFallback — every element walks an
    expression tree). Counting distinct word-tuples equals counting
    distinct ``concat_ws(" ", ...)`` strings because words cannot contain
    the split character, so the join is bijective. Only the INTEGER
    counts come back from Python; the rounded ratio is the same Catalyst
    ``round(1 - distinct/total, 6)`` expression as the oracle-shape twin,
    so the output is bit-identical (pinned by test; measured 2.1s ->
    0.66s at sf1.0 on the floored scan)."""
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType([docs.schema[id_col],
                             StructField("_tot", LongType()),
                             StructField("_dis", LongType())])

    def fn(batches):
        for pdf in batches:
            ids, tot, dis = [], [], []
            for did, txt in zip(pdf[id_col].values, pdf[text_col].values):
                if txt is None:
                    # matches the Catalyst twin: NULL text -> empty gram
                    # array -> (0 grams, ratio 0.0)
                    ids.append(did); tot.append(0); dis.append(0)
                    continue
                w = txt.split(" ")
                m = len(w) - (n - 1)
                if m <= 0:
                    ids.append(did); tot.append(0); dis.append(0)
                    continue
                ids.append(did)
                tot.append(m)
                dis.append(len(set(zip(*(w[i:] for i in range(n))))))
            yield pd.DataFrame({id_col: ids, "_tot": tot, "_dis": dis})

    c = docs.select(id_col, text_col).mapInPandas(fn, out_schema)
    return c.select(
        F.col(id_col),
        F.col("_tot").alias("n_grams"),
        F.when(F.col("_tot") > 0,
               F.round(1.0 - F.col("_dis") / F.col("_tot"), 6))
        .otherwise(0.0).alias("rep_ratio"))


def tf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` most characteristic terms per document by tf x linear idf
    (score = tf * N / df — the linear-idf variant keeps the score an exact
    integer ratio, so double division is bit-identical in any engine; a log
    idf would rank the same only per (tf, df) level set but its ln() is not
    cross-engine exact). Ties broken by term ascending.

    Scale shape: explode -> (doc, term) hash-agg (map-side combine eats
    intra-partition repeats) -> term-level df agg -> shuffle join tf x df
    (both corpus-sized) -> per-doc AGGREGATE top-k: a bounded
    collect_list + array_sort + slice per doc instead of a row_number
    window — the hash aggregate replaces a full sort of the corpus-sized
    scored frame (r6 paired A/B at sf1.0: 2.74s -> 1.31s), and the
    per-group sort is over that doc's term count only. Ordering is the
    struct sort on (-score, term) = score desc / term asc — the same
    deterministic tie-break as the window formulation (row-identical,
    pinned by the oracle gate). No driver state: the corpus row count N
    rides in-plan as a broadcast cross join (the oracle's CROSS JOIN n
    shape)."""
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    words = (docs.select(id_col,
                         F.explode(F.split(F.col(text_col), " ", -1))
                         .alias("term"))
             .filter(F.col("term") != ""))
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "term").crossJoin(F.broadcast(n_docs)).select(
        id_col, "term",
        (F.col("tf") * F.col("_n") / F.col("df")).alias("score"))
    top = (scored.groupBy(id_col)
           .agg(F.slice(F.array_sort(F.collect_list(
               F.struct((-F.col("score")).alias("_ns"),
                        F.col("term").alias("term"),
                        F.col("score").alias("score")))), 1, k)
               .alias("_top")))
    return (top.select(id_col, F.posexplode("_top").alias("_p", "_t"))
            .select(id_col, F.col("_t.term").alias("term"),
                    F.round("_t.score", 6).alias("score"),
                    (F.col("_p") + 1).cast("int").alias("rnk")))


def vocab_topk(docs: DataFrame, k: int = 50, n: int = 2,
               text_col: str = "text") -> DataFrame:
    """Corpus-wide top-``k`` word ``n``-grams by frequency (the vocabulary /
    BPE-merge-candidate census). Deterministic order: count desc, gram asc.

    Scale shape: per-row Catalyst n-gram array -> explode -> two-phase
    hash-agg on the gram -> TakeOrdered(k) (orderBy+limit compiles to a
    per-partition top-k + driver merge of k*partitions rows — never a full
    sort of the gram census)."""
    grams = _word_ngrams(text_col, n)
    return (docs.select(F.explode(grams).alias("gram"))
            .groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("gram"))
            .limit(k))


def deterministic_split(docs: DataFrame, train: float = 0.9,
                        valid: float = 0.05,
                        id_col: str = "doc_id") -> DataFrame:
    """Deterministic train/valid/test assignment by the portable KMV hash
    of the id: stable across runs, engines and cluster sizes, and disjoint
    by construction. Pure projection — zero shuffles."""
    from .sketch import kmv_hash

    if not (0 < train < 1 and 0 <= valid < 1 and train + valid <= 1):
        raise ValueError("need 0<train<1, 0<=valid, train+valid<=1")
    # integral-id guard (same hazard packing._require_integral_id names):
    # kmv_hash casts to long, so a STRING id becomes NULL, both when()
    # branches go NULL, and EVERY row silently lands in 'test'
    dt = docs.schema[id_col].dataType.simpleString()
    if dt not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise ValueError(
            f"deterministic_split needs an integral id column; {id_col!r} "
            f"is {dt} — derive a numeric id first (a string id casts to "
            "NULL and every row would silently split to 'test')")
    u = F.pmod(kmv_hash(F.col(id_col)), F.lit(10_000))
    t_hi = int(round(train * 10_000))
    v_hi = t_hi + int(round(valid * 10_000))
    split = (F.when(u < t_hi, "train")
             .when(u < v_hi, "valid").otherwise("test"))
    return docs.select(F.col(id_col), split.alias("split"))


def deterministic_split_case_sql(train: float = 0.9, valid: float = 0.05,
                                 id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`deterministic_split`'s CASE expression."""
    from .sketch import kmv_hash_sql

    t_hi = int(round(train * 10_000))
    v_hi = t_hi + int(round(valid * 10_000))
    u = f"({kmv_hash_sql(id_col)} % 10000)"
    return (f"CASE WHEN {u} < {t_hi} THEN 'train' "
            f"WHEN {u} < {v_hi} THEN 'valid' ELSE 'test' END")


def token_rarity(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document corpus-frequency (rarity) score: the mean corpus
    frequency of the document's token occurrences,
    ``sum_t count(t) / (n_tokens_doc * total_token_occurrences)``. Low
    values = rare/unusual vocabulary, high = boilerplate — the unigram
    twin of a perplexity quality filter.

    Exactness: both sums are int64 aggregates (exact, order-independent)
    and the score is ONE double division of the same two integers in any
    engine — bit-identical cross-engine, per the tf x linear-idf
    precedent (an ``ln``-based logprob would not be).

    Scale shape: explode -> (doc, term) and term-level hash-aggs with
    map-side combine -> tf x corpus-count shuffle join on term (both
    corpus-sized; AQE broadcasts the vocab side when it fits) -> per-doc
    sum. No driver state except the total-occurrences scalar."""
    words = (docs.select(id_col,
                         F.explode(F.split(F.col(text_col), " ", -1))
                         .alias("term"))
             .filter(F.col("term") != ""))
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    # total occurrences as an in-plan broadcast scalar (the oracle's
    # ``(SELECT total FROM tot)`` shape). Previously this was a collect()
    # whose job ran the whole explode -> tf -> cf chain a second time;
    # in-plan, ReuseExchange shares the tf and cf exchanges between the
    # total branch and the per_doc branch, so the chain runs once and the
    # query is ONE job. long * double arithmetic unchanged (bit-identical
    # to the former float(total) literal).
    tot = cf.agg(F.sum("cf").cast("double").alias("_total"))
    per_doc = (tf.join(cf, "term")
               .groupBy(id_col)
               .agg(F.sum("tf").alias("n_tokens"),
                    F.sum(F.col("tf") * F.col("cf")).alias("cf_sum")))
    return per_doc.crossJoin(F.broadcast(tot)).select(
        F.col(id_col), F.col("n_tokens"), F.col("cf_sum"),
        (F.col("cf_sum") / (F.col("n_tokens") * F.col("_total")))
        .alias("rarity"))
