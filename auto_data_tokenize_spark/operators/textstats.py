"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

No reference counterpart (auto-data-tokenize stops at PII); these are
the large-scale corpus-prep operators the engine adds. Everything here
is pure JVM-side expression (whole-stage codegen, no Python), built
from SQL fragments that are *dialect-portable*: the same expression
text runs on Spark and on the DuckDB oracle, so correctness checks are
literal.

Scale: all transforms are narrow (scan→project); aggregations happen
downstream in whatever query composes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# A BPE-ish pre-tokenization: letter runs, digit runs, single
# non-alphanumeric marks (GPT-2-style pre-split, simplified; public).
BPEISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
# Spark SQL string literals eat single backslashes; DuckDB's don't.
BPEISH_RE_SPARK_SQL = BPEISH_RE.replace("\\", "\\\\")

# Small public stopword lists (top function words). zh is omitted:
# whitespace tokenization cannot carry it (documented limitation).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "you", "that", "was",
           "for", "on", "are", "as", "with", "they", "this", "have", "from"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ich", "sie", "mit",
           "ein", "eine", "auf", "den", "dem", "des", "zu", "im", "von"],
    "es": ["el", "la", "los", "las", "de", "que", "en", "un", "una", "es",
           "por", "con", "para", "su", "del", "se", "no", "como"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans",
           "que", "qui", "sur", "au", "du", "des", "pas", "plus"],
}
LANG_PRIORITY = ["en", "de", "es", "fr"]  # deterministic tie-break order


def _sql_list(words: list[str]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def _sql_list_duck(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def ws_tokens_expr(text_col: str) -> "F.Column":
    """Whitespace token COUNT — the one cross-engine tokenization
    contract (twin: ``duckdb_ws_tokens_sql``). Shared by token_counts,
    pack_sequences, and the quantile fragments so a rule change lands
    everywhere at once.

    NULL text → NULL, explicitly: the twin's length(NULL) is NULL, and
    Spark's size(NULL) is NULL only under ANSI mode (-1 under legacy
    sizeOfNull) — the explicit guard makes the contract independent of
    the deployment's spark.sql.ansi.enabled setting."""
    return F.when(
        F.col(text_col).isNotNull(),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")),
    )


def duckdb_ws_tokens_sql(text_col: str) -> str:
    """DuckDB twin of ``ws_tokens_expr``."""
    return f"length(string_split_regex(trim({text_col}), '\\s+'))"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars, n_ws_tokens (whitespace), n_bpeish_tokens (regex
    pre-tokenizer) — the unit-economics columns of a corpus pipeline."""
    return (
        df.withColumn("n_chars", F.length(text_col))
        .withColumn("n_ws_tokens", ws_tokens_expr(text_col))
        .withColumn(
            "n_bpeish_tokens",
            F.size(
                F.expr(f"regexp_extract_all({text_col}, '{BPEISH_RE_SPARK_SQL}', 0)")
            ),
        )
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer quality features + a boolean gate. Thresholds follow the
    usual corpus-filtering heuristics (Gopher/C4-style, public)."""
    en = _sql_list(STOPWORDS["en"])
    out = (
        token_counts(df, text_col)
        .withColumn(
            "n_stop_hits",
            F.expr(
                f"size(array_intersect(split(lower({text_col}), '[^a-z]+'), {en}))"
            ),
        )
        .withColumn(
            "n_punct",
            F.size(F.expr(f"regexp_extract_all({text_col}, '[.,;:!?]', 0)")),
        )
    )
    return out.withColumn(
        "is_quality",
        (F.col("n_ws_tokens") >= 5)
        & (F.col("n_chars") >= 20)
        & (F.col("n_stop_hits") >= 1),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: distinct-stopword hits per language,
    argmax with fixed priority tie-break; zero hits → 'unknown'."""
    out = df
    for lang in LANG_PRIORITY:
        out = out.withColumn(
            f"_h_{lang}",
            F.expr(
                "size(array_distinct(array_intersect("
                f"split(lower({text_col}), '[^a-z]+'), {_sql_list(STOPWORDS[lang])})))"
            ),
        )
    cases = []
    for i, lang in enumerate(LANG_PRIORITY):
        others = [f"_h_{o}" for o in LANG_PRIORITY[i + 1 :]]
        c = (F.col(f"_h_{lang}") > 0)
        for o in others:
            c = c & (F.col(f"_h_{lang}") >= F.col(o))
        cases.append((c, lang))
    expr = F.when(cases[0][0], cases[0][1])
    for c, lang in cases[1:]:
        expr = expr.when(c, lang)
    expr = expr.otherwise("unknown")
    return out.withColumn("pred_lang", expr).drop(
        *[f"_h_{lang}" for lang in LANG_PRIORITY]
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: md5 over lowercased,
    whitespace-collapsed text — the cheap exact-dup key. (Winnowing
    fingerprints for partial overlap: :func:`winnowing_fingerprints`.)"""
    return df.withColumn(
        "fingerprint",
        F.md5(F.concat_ws(" ", F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))),
    )


_NORM = "concat_ws(' ', split(lower(trim({t})), '\\\\s+'))"


def winnowing_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (public: Schleimer, Wilkerson,
    Aiken, SIGMOD'03 'Winnowing: Local Algorithms for Document
    Fingerprinting'): hash every k-char gram of the normalized text
    (lowercased, whitespace-collapsed), slide a window of ``w``
    consecutive gram hashes, keep the minimum of each window, dedupe.
    Guarantee: two documents sharing a substring of ≥ w + k - 1
    normalized chars share ≥ 1 fingerprint — the partial-overlap
    detector exact/minhash dedup can't provide.

    Pure whole-stage-codegen expressions (md5 → 32-bit ints), zero
    Python, and portable verbatim to DuckDB (q29's oracle recomputes
    it). Output: (id, fp) exploded rows, distinct per doc — ready for
    a fingerprint-equality self-join at corpus scale (one shuffle on
    uniform 32-bit keys)."""
    norm = _NORM.format(t=text_col)
    from auto_data_tokenize_spark.functions.xengine import spark_md5_prefix

    gram_hash = spark_md5_prefix(f"substring(_n, i, {k})")
    grams = (
        f"(if(length(_n) >= {k}, transform(sequence(1, length(_n) - {k} + 1),"
        f" i -> {gram_hash}),"
        " array()))"
    )
    wins = (
        f"(if(size(_g) >= {w}, array_distinct(transform(sequence(1, size(_g) - {w} + 1),"
        f" j -> array_min(slice(_g, j, {w})))), array()))"
    )
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    # house materialization barriers: keep Catalyst from inlining the
    # gram-hash array into the window lambda (w× md5 recompute)
    staged = (
        df.select(F.col(id_col), F.expr(norm).alias("_n"))
        .repartition(parallelism, F.col(id_col))
        .select(F.col(id_col), F.expr(grams).alias("_g"))
        .select(F.col(id_col), F.expr(wins).alias("_f"))
    )
    return (
        staged.select(F.col(id_col), F.explode_outer("_f").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )


def _duck_gram_hash(k: int) -> str:
    from auto_data_tokenize_spark.functions.xengine import duckdb_md5_prefix

    return duckdb_md5_prefix(f"substr(_n, i::INTEGER, {k})")


def duckdb_winnowing_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, w: int = 4,
) -> str:
    """DuckDB twin of :func:`winnowing_fingerprints` (q29 oracle)."""
    return f"""
      WITH n AS (
        SELECT {id_col},
               array_to_string(string_split_regex(trim(lower({text_col})), '\\s+'), ' ') AS _n
        FROM {table}
      ), g AS (
        SELECT {id_col},
               CASE WHEN length(_n) >= {k}
                 THEN list_transform(range(1, length(_n) - {k} + 2),
                      i -> {_duck_gram_hash(k)})
                 ELSE [] END AS _g
        FROM n
      ), f AS (
        SELECT {id_col},
               CASE WHEN len(_g) >= {w}
                 THEN list_distinct(list_transform(range(1, len(_g) - {w} + 2),
                      j -> list_min(_g[j:j + {w} - 1])))
                 ELSE [] END AS _f
        FROM g
      )
      SELECT {id_col}, unnest(_f) AS fp FROM f
    """


QUANTILES = [0.25, 0.5, 0.75, 0.95]


def length_quantiles_by_lang(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus unit-economics distribution: exact interpolated quantiles
    of whitespace-token counts per predicted language — the
    length-filtering calibration query a corpus pipeline runs before
    choosing cut-offs. Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the continuous-interpolation definition, so
    the oracle is literal.

    Scale: one shuffle on pred_lang (bounded cardinality); exact
    percentile sorts within each tiny group. For 100 TB one would use
    ``percentile_approx`` (t-digest) — kept exact here because the
    oracle gate demands bit-equality and language cardinality is O(10)."""
    base = token_counts(language_id(df, text_col), text_col)
    q = ", ".join(str(x) for x in QUANTILES)
    return (
        base.groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(f"percentile(n_ws_tokens, array({q}))").alias("_q"),
        )
        .select(
            "pred_lang",
            "n_docs",
            *[
                F.round(F.col("_q")[i], 6).alias(f"p{int(p * 100)}")
                for i, p in enumerate(QUANTILES)
            ],
        )
    )


def duckdb_length_quantiles_sql(table: str, text_col: str = "text") -> str:
    """DuckDB twin of :func:`length_quantiles_by_lang` (q35 oracle)."""
    lang = duckdb_language_id_sql(table, text_col)
    qcols = ", ".join(
        f"round(quantile_cont(n_ws_tokens, {p}), 6) AS p{int(p * 100)}"
        for p in QUANTILES
    )
    return f"""
        WITH lang AS ({lang}),
        tok AS (
          SELECT doc_id,
                 {duckdb_ws_tokens_sql(text_col)} AS n_ws_tokens
          FROM {table}
        )
        SELECT l.pred_lang, COUNT(*) AS n_docs, {qcols}
        FROM lang l JOIN tok USING (doc_id)
        GROUP BY 1
    """


# -- DuckDB oracle fragments (kept adjacent so the two dialects evolve
#    together; used by __spark_entry__.oracle_sql) -------------------------


def duckdb_language_id_sql(table: str, text_col: str = "text") -> str:
    hits = ",\n".join(
        f"length(list_distinct(list_filter(string_split_regex(lower({text_col}), '[^a-z]+'),"
        f" w -> list_contains({_sql_list_duck(STOPWORDS[lang])}, w)))) AS _h_{lang}"
        for lang in LANG_PRIORITY
    )
    cases = []
    for i, lang in enumerate(LANG_PRIORITY):
        conds = [f"_h_{lang} > 0"] + [
            f"_h_{lang} >= _h_{o}" for o in LANG_PRIORITY[i + 1 :]
        ]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"""
        WITH h AS (SELECT doc_id, {hits} FROM {table})
        SELECT doc_id, CASE {' '.join(cases)} ELSE 'unknown' END AS pred_lang
        FROM h
    """


# -- TF-IDF ---------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document — the standard corpus keyword /
    feature-selection pass of a training-data pipeline.

    score = tf * (ln((N + 1) / (df + 1)) + 1)   (smoothed idf, always
    positive so frequent-everywhere terms still rank by tf instead of
    vanishing). Ranking and the driver-gate hash both use the score
    ROUNDED to 6 decimals with a lexicographic term tie-break, so the
    ordering is reproducible across engines regardless of 1-ulp libm
    differences (same contract as the cosine queries).

    Plan shape / 100 TB notes: tokenize is a narrow explode; per-doc
    term counts are ONE hash aggregate on (id, term) with map-side
    partial combine; document frequency is a second aggregate on term
    whose output is joined back on term (co-partitioned with the agg —
    Catalyst reuses the exchange); N is a 1-row aggregate broadcast
    into the plan, never collected; top-k is one window shuffle on id.
    No Python anywhere.
    """
    # explode_outer, deliberately (house rule): plain explode lets
    # InferFiltersFromGenerate synthesize size(split(...)) > 0 below
    # the exchange, re-evaluating the tokenization on the scan branch.
    # split of a trimmed string is never empty, and the null row an
    # empty array would emit dies in the length filter anyway.
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.length("term") > 0)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n = df.agg(F.countDistinct(id_col).alias("_n"))
    from pyspark.sql import Window

    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + 1) / (F.col("_df") + 1)) + F.lit(1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def duckdb_tfidf_sql(table: str, text_col: str = "text", k: int = 5) -> str:
    """DuckDB twin of ``tfidf_top_terms`` (same smoothing, same
    rounded-score ordering contract)."""
    score = "round(tf * (ln((n + 1)::DOUBLE / (dfreq + 1)) + 1), 6)"
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(lower({text_col})), '\\s+')) AS term
          FROM {table}
        ),
        tf AS (
          SELECT doc_id, term, count(*) AS tf
          FROM toks WHERE length(term) > 0 GROUP BY 1, 2
        ),
        dfq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
        n AS (SELECT count(DISTINCT doc_id) AS n FROM {table})
        SELECT doc_id, term, tf, {score} AS tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY {score} DESC, term) AS rank
        FROM tf JOIN dfq USING (term), n
        QUALIFY rank <= {k}
    """


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher/MassiveText-style intra-document repetition signals
    (Rae et al. '21 §A1.1 adapted to whitespace word streams):

    - ``dup_word_frac``: 1 - distinct/total words — a pure codegen
      projection, no shuffle.
    - ``top_ngram_frac``: occurrences of the single most frequent
      word n-gram over total n-grams. Tie-break: the lexicographically
      GREATEST gram among the max-count grams (Spark: max over a
      (count, gram) struct; twin: ORDER BY cnt DESC, gram DESC), so
      both engines pick the same gram deterministically.

    Plan shape: one (id, gram) count shuffle with map-side partial
    aggregation, one id-level re-aggregation, one id-equi-join back to
    the projection — all whole-stage codegen; n-grams come from the
    same slice construction as ``word_shingles`` (explode, not
    higher-order lambdas, on the counted path). Repetitious documents
    are exactly the ones an LLM pipeline drops before training.
    """
    from auto_data_tokenize_spark.operators.dedup import word_shingles

    w = f"split(trim(lower({text_col})), '\\\\s+')"
    dup = df.select(
        id_col,
        F.round(
            F.lit(1)
            - F.expr(f"size(array_distinct({w}))")
            / F.expr(f"size({w})"),
            6,
        ).alias("dup_word_frac"),
    )
    # NULL-text docs: empty shingle array → one NULL gram row from
    # explode_outer; dropping it means such docs vanish from the
    # output exactly like the twin's inner join over zero unnested
    # grams (otherwise Spark fabricates a (id, NULL) gram group with
    # top_ngram_frac = 1.0 that the oracle never sees).
    grams = word_shingles(df, text_col, n, out_col="_g").select(
        id_col, F.explode_outer("_g").alias("_g")
    ).where(F.col("_g").isNotNull())
    counts = grams.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    top = (
        counts.groupBy(id_col)
        .agg(
            F.max(F.struct(F.col("_c"), F.col("_g"))).alias("_top"),
            F.sum("_c").alias("_tot"),
        )
        .select(
            id_col,
            F.round(F.col("_top._c") / F.col("_tot"), 6).alias(
                "top_ngram_frac"
            ),
        )
    )
    return dup.join(top, id_col)


def duckdb_repetition_sql(table: str, text_col: str = "text", n: int = 2) -> str:
    """DuckDB twin of ``repetition_stats`` — identical slice-based
    n-gram construction and (cnt DESC, gram DESC) tie-break."""
    return f"""
        WITH w AS (
          SELECT doc_id, string_split_regex(trim(lower({text_col})), '\\s+') AS w
          FROM {table}
        ),
        g AS (
          SELECT doc_id,
                 unnest(list_transform(
                     range(0, greatest(len(w) - {n}, 0) + 1),
                     i -> array_to_string(list_slice(w, i + 1, i + {n}), ' ')
                 )) AS g
          FROM w
        ),
        c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
        r AS (
          SELECT doc_id, c,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY c DESC, g DESC) AS rn,
                 sum(c) OVER (PARTITION BY doc_id) AS tot
          FROM c
        )
        SELECT w.doc_id,
               round(1 - len(list_distinct(w.w))::DOUBLE / len(w.w), 6)
                   AS dup_word_frac,
               round(r.c::DOUBLE / r.tot, 6) AS top_ngram_frac
        FROM w JOIN r ON w.doc_id = r.doc_id AND r.rn = 1
    """


#: the mergeable measures a dataset-card partial carries (see
#: :func:`dataset_report_partial`); fixed order so unions line up.
PARTIAL_MEASURES = (
    "n_docs", "n_text_docs", "total_tokens", "min_tokens", "max_tokens"
)


def dataset_report_partial(
    df: DataFrame,
    group_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Mergeable pre-aggregation behind :func:`dataset_report`: the
    card's measures PLUS ``n_text_docs`` (docs with non-NULL text) —
    the denominator the mean needs, which ``n_docs`` alone cannot
    re-derive because every token measure skips NULL text (the uniform
    NULL-text contract: the doc is counted, contributes no tokens).
    Columns: ``group_cols..., n_docs, n_text_docs, total_tokens,
    min_tokens, max_tokens``; closed under
    :func:`merge_report_partials`. One partial-aggregated groupBy."""
    group_cols = group_cols or ["lang", "source"]
    n_tok = ws_tokens_expr(text_col)
    return (
        df.withColumn("_nt", n_tok)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("_nt").cast("long").alias("n_text_docs"),
            F.sum("_nt").alias("total_tokens"),
            F.min("_nt").alias("min_tokens"),
            F.max("_nt").alias("max_tokens"),
        )
    )


def render_dataset_card(
    partial: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Render the release-shape dataset card from a (possibly merged)
    partial: the mean re-derives from the EXACT integer totals over
    the NULL-skipping denominator — Spark's integral ``avg`` is
    sum(long)/count, the identical division, so this equals the
    one-shot aggregate bit-for-bit; all-NULL-text groups render a NULL
    mean exactly like ``F.avg`` over no values."""
    group_cols = group_cols or ["lang", "source"]
    return partial.select(
        *group_cols,
        "n_docs",
        "total_tokens",
        "min_tokens",
        F.when(
            F.col("n_text_docs") > 0,
            F.round(
                F.col("total_tokens").cast("double")
                / F.col("n_text_docs"),
                6,
            ),
        ).alias("avg_tokens"),
        "max_tokens",
    )


def dataset_report(
    df: DataFrame,
    group_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-group dataset card: document count, token totals, and
    document-length distribution (min/mean/max) — the summary table a
    corpus release ships with. One partial-aggregated groupBy; every
    measure derives from the shared ``ws_tokens_expr`` contract so the
    SQL twin is exact. Composed as render(partial) so the one-shot and
    the incremental (:func:`merge_dataset_reports`) paths share one
    definition of every measure."""
    return render_dataset_card(
        dataset_report_partial(df, group_cols, text_col), group_cols
    )


def duckdb_dataset_report_sql(
    table: str,
    group_cols: list[str] | None = None,
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``dataset_report``."""
    group_cols = group_cols or ["lang", "source"]
    g = ", ".join(group_cols)
    nt = duckdb_ws_tokens_sql(text_col)
    return f"""
        SELECT {g},
               count(*) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS total_tokens,
               min(nt) AS min_tokens,
               round(avg(nt), 6) AS avg_tokens,
               max(nt) AS max_tokens
        FROM (SELECT {g}, {nt} AS nt FROM {table}) t
        GROUP BY {g}
    """


def merge_report_partials(
    *partials: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge :func:`dataset_report_partial` frames into the partial of
    the union — associative and closed (the output is itself a
    partial), so yesterday's merged partial + today's delta partial is
    a valid input tomorrow. Counts/sums add, min/max fold; each input
    is projected to the fixed partial column set before the union, so
    extra columns are ignored rather than tripping ``unionByName``'s
    strict schema match. One |groups|-sized groupBy — nothing rescans
    documents."""
    if not partials:
        raise ValueError("at least one report partial is required")
    group_cols = group_cols or ["lang", "source"]
    need = [*group_cols, *PARTIAL_MEASURES]
    for r in partials:
        missing = set(need) - set(r.columns)
        if missing:
            raise ValueError(f"report partial missing columns: {missing}")
    u = partials[0].select(*need)
    for r in partials[1:]:
        u = u.unionByName(r.select(*need))
    return u.groupBy(*group_cols).agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_text_docs").cast("long").alias("n_text_docs"),
        F.sum("total_tokens").cast("long").alias("total_tokens"),
        F.min("min_tokens").alias("min_tokens"),
        F.max("max_tokens").alias("max_tokens"),
    )


def merge_dataset_reports(
    *partials: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Incremental dataset-card maintenance: merge per-slice
    :func:`dataset_report_partial` frames and render the release-shape
    card of the union. At 100 TB the nightly card comes from
    yesterday's merged PARTIAL plus today's delta partial, never a
    corpus re-scan, and equals the one-shot :func:`dataset_report`
    bit-for-bit — including NULL-text documents, whose NULL-skipping
    mean denominator travels in the partials as ``n_text_docs`` (a
    rendered card alone cannot be merged exactly, which is why the
    inputs are partials, not cards). Group slices may overlap."""
    return render_dataset_card(
        merge_report_partials(*partials, group_cols=group_cols),
        group_cols,
    )


def baseline_shares(df: DataFrame, cat_col: str) -> DataFrame:
    """Reference categorical distribution: per-category share of the
    corpus — the broadcast side of ``distribution_drift_monitor``.
    One partial-agg groupBy; |categories| rows (KBs even at 100 TB)."""
    counts = df.groupBy(cat_col).agg(F.count(F.lit(1)).alias("_n"))
    tot = counts.agg(F.sum("_n").cast("double").alias("_tot"))
    return counts.crossJoin(F.broadcast(tot)).select(
        cat_col, (F.col("_n") / F.col("_tot")).alias("base_share")
    )


def distribution_drift_monitor(
    df: DataFrame,
    cat_col: str,
    baseline: DataFrame,
    window: str = "1 minute",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per-window categorical drift vs a reference distribution — the
    alarm a crawl-ingest pipeline runs so a scraper change that flips
    the language (or source/domain) mix is caught in the window it
    happens, not at the next batch audit. Works on batch and streaming
    inputs alike (the streaming shape is two CHAINED stateful
    aggregations via ``window_time`` with a stream-static broadcast
    join between them, append mode).

    Output per window: ``window_start, n_docs, n_cats, l1_drift``
    where ``l1_drift = Σ_observed |n_cat/n_docs − base_share_cat|``
    (categories absent from the window contribute nothing — documented
    so the SQL twin is exact; a category missing from the baseline
    drifts by its full window share).

    Scale: the first windowed groupBy shrinks the stream with map-side
    partials to |windows × cats| rows; the baseline is broadcast; the
    second agg's state is one collected list per window, bounded by
    |cats|. ``array_sort`` pins the float summation order so reruns
    hash identically."""
    d = df.withWatermark(ts_col, watermark) if watermark is not None else df
    win = d.groupBy(F.window(F.col(ts_col), window).alias("w"), cat_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    # null-safe equality: a NULL category (e.g. language-id failed) is
    # a real stratum on BOTH sides — a NULL-rejecting equi-join would
    # zero its baseline share and raise a standing false alarm
    b = baseline.withColumnRenamed(cat_col, "_bc")
    j = (
        win.join(
            F.broadcast(b), win[cat_col].eqNullSafe(b["_bc"]), "left"
        )
        .drop("_bc")
        .withColumn("_b", F.coalesce(F.col("base_share"), F.lit(0.0)))
    )
    agged = j.groupBy(F.window(F.window_time("w"), window).alias("cw")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(cat_col).alias("c"), "_n", "_b"))
        ).alias("_l")
    )
    n_docs = F.aggregate(
        "_l", F.lit(0).cast("long"), lambda a, x: a + x["_n"]
    )
    return (
        agged.withColumn("n_docs", n_docs)
        .withColumn("n_cats", F.size("_l"))
        .withColumn(
            "l1_drift",
            F.round(
                F.aggregate(
                    "_l",
                    F.lit(0.0),
                    lambda a, x: a
                    + F.abs(x["_n"] / F.col("n_docs") - x["_b"]),
                ),
                6,
            ),
        )
        .select(
            F.col("cw.start").alias("window_start"),
            "n_docs",
            "n_cats",
            "l1_drift",
        )
    )


def duckdb_drift_sql(
    table: str,
    cat_col: str,
    window_us: int = 60_000_000,
    ts_expr: str = "ts",
) -> str:
    """DuckDB twin of ``distribution_drift_monitor`` (same observed-
    categories-only L1, same rounding). ``ts_expr`` lets the caller
    reconstruct the stream's arrival timestamps; the final-watermark
    filter (streaming append mode) is the caller's HAVING clause."""
    return f"""
        WITH src AS (
          SELECT {cat_col} AS c, {ts_expr} AS ts FROM {table}
        ), base AS (
          SELECT c, COUNT(*) * 1.0 / (SELECT COUNT(*) FROM src) AS b
          FROM src GROUP BY c
        ), win AS (
          SELECT make_timestamp((epoch_us(ts) // {window_us}) * {window_us})
                   AS window_start,
                 c, CAST(COUNT(*) AS BIGINT) AS n
          FROM src GROUP BY 1, 2
        ), tot AS (
          SELECT window_start, CAST(SUM(n) AS BIGINT) AS n_docs,
                 CAST(COUNT(*) AS INT) AS n_cats
          FROM win GROUP BY 1
        )
        SELECT w.window_start, t.n_docs, t.n_cats,
               ROUND(SUM(ABS(w.n * 1.0 / t.n_docs - COALESCE(b.b, 0.0))), 6)
                 AS l1_drift
        FROM win w
        JOIN tot t USING (window_start)
        LEFT JOIN base b ON w.c IS NOT DISTINCT FROM b.c
        GROUP BY 1, 2, 3
    """


def explode_tokens(
    df: DataFrame, text_col: str = "text", keep: list[str] | None = None
) -> DataFrame:
    """THE one spelling of the lowercased whitespace token explosion —
    shared by the vocabulary builder and OOV monitor here and by the
    streaming token monitors (``streaming/pipeline._token_rows``
    delegates to this), so a contract change lands in every consumer
    at once: ``split(trim(lower(text)), '\\s+')``, empty tokens
    dropped, NULL text contributes nothing (split(NULL) is NULL and
    plain explode emits no rows). Output: ``keep`` columns + ``token``
    — projecting only what's asked for keeps the explode narrow and
    avoids column-name collisions with callers' own helper columns."""
    keep = list(keep or [])
    if "token" in keep:
        raise ValueError("keep may not contain 'token' (the output column)")
    return df.select(
        *keep,
        F.explode(
            F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
        ).alias("token"),
    ).filter(F.col("token") != "")


def vocab_from_corpus(
    df: DataFrame,
    text_col: str = "text",
    min_df: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """Observed vocabulary: distinct lowercased whitespace tokens with
    corpus frequency >= ``min_df``, optionally truncated to the
    ``top_k`` most frequent (count desc, token asc tie-break — the
    finite-vocab shape real tokenizers ship with) — the broadcast side
    of ``oov_rate_monitor``. One partial-agg token groupBy; the top-k
    is TakeOrdered, never a full sort; the output is vocabulary-sized
    (10^5-10^6 rows), small enough to broadcast."""
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    if top_k is not None and top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    counts = (
        explode_tokens(df, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_df)
    )
    if top_k is not None:
        counts = counts.orderBy(
            F.col("_df").desc(), F.col("token")
        ).limit(top_k)
    return counts.select("token")


def oov_rate_monitor(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    window: str = "1 minute",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per-window out-of-vocabulary rate of the live token stream
    against a fixed vocabulary — the drift alarm that catches a new
    language, spam alphabet, or encoding bug arriving in the ingest
    feed (tokens the tokenizer has never seen degrade downstream
    models before any quality score moves). Works on batch and
    streaming inputs alike; streaming shape is a stateless explode +
    broadcast left join (vocab side is bounded), then ONE windowed
    groupBy with map-side partials.

    Output per window: ``window_start, n_tokens, n_oov, oov_rate``
    (round 6)."""
    toks = explode_tokens(df, text_col, keep=[ts_col])
    if watermark is not None:
        toks = toks.withWatermark(ts_col, watermark)
    vocab_hit = vocab.select(
        F.col("token").alias("_vtok"), F.lit(1).alias("_in_vocab")
    )
    j = toks.join(
        F.broadcast(vocab_hit), toks["token"] == vocab_hit["_vtok"], "left"
    )
    return (
        j.groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_oov"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


def duckdb_oov_sql(
    table: str,
    vocab_sql: str,
    text_col: str = "text",
    window_us: int = 60_000_000,
    ts_expr: str = "ts",
) -> str:
    """DuckDB twin of ``oov_rate_monitor``; ``vocab_sql`` is a query
    producing a single ``token`` column (pair with
    ``duckdb_vocab_sql``)."""
    return f"""
        WITH toks AS (
          SELECT make_timestamp((epoch_us({ts_expr}) // {window_us})
                   * {window_us}) AS window_start,
                 unnest(string_split_regex(trim(lower({text_col})), '\\s+'))
                   AS token
          FROM {table}
          WHERE {text_col} IS NOT NULL
        ), v AS ({vocab_sql})
        SELECT t.window_start,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov,
               ROUND(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*), 6) AS oov_rate
        FROM toks t LEFT JOIN v USING (token)
        WHERE t.token <> ''
        GROUP BY 1
    """


def duckdb_vocab_sql(
    table: str,
    text_col: str = "text",
    min_df: int = 1,
    top_k: int | None = None,
) -> str:
    """DuckDB twin of ``vocab_from_corpus`` (same tie-break)."""
    limit = ""
    if top_k is not None:
        limit = f"ORDER BY COUNT(*) DESC, token LIMIT {top_k}"
    return f"""
        SELECT token FROM (
          SELECT unnest(string_split_regex(trim(lower({text_col})), '\\s+'))
                   AS token
          FROM {table} WHERE {text_col} IS NOT NULL
        ) WHERE token <> ''
        GROUP BY token HAVING COUNT(*) >= {min_df}
        {limit}
    """
