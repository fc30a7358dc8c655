"""Pretraining-corpus MIXING and published quality-filter plans.

Three operators from the published LLM-pretraining-pipeline literature
that sit between cleaning (plans/curation.py) and selection
(plans/selection.py):

- ``gopher_quality_rules`` — the Gopher/MassiveText rule panel
  (arXiv:2112.11446 §A1.1): word-count bounds, mean-word-length
  bounds, stopword presence, max-single-word-share repetition gate.
  Each rule reported per source plus the all-rules keep rate.
- ``mixture_temperature_weights`` — multinomial source-mixing weights
  at temperature τ (the mT5/XLM-R sampling scheme, arXiv:2010.11934):
  w_s ∝ n_s^τ with τ=1 (proportional) and τ=0.5 (sqrt — exact via
  correctly-rounded IEEE SQRT on both engines), plus the token
  allocation and expected epochs per source at a fixed budget.
- ``ngram_entropy_profile`` — per-source character-bigram entropy
  (the CCNet/Gopher "gibberish" signal): low entropy = templated or
  repeated content, high = noise. Exact integers end-to-end via
  µ-quantized xlog10 (the dsir pattern from plans/resampling.py).

All shares/scores are exact integer arithmetic (DIV / ppm / basis
points), so both engines produce bit-identical values.

Reference anchor: the reference's quality gating is its classifier
confidence thresholds (data_transformation.py dt:221-268); these rows
add the published-rule-panel and mixing layers a 100 TB pretraining
corpus needs on top.

100 TB notes: gopher rules are ONE corpus explode into per-doc
aggregates joined back on doc_id (key-local); mixing weights are a
per-source aggregate (|sources| rows) with the totals broadcast back;
the entropy profile explodes char bigrams into a (source, bigram)
aggregate — map-side combinable, output bounded by |sources|·|Σ|².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stacktrend_spark.functions.rounding import sql_xlog10, xlog10
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table

# Gopher panel thresholds (word counts / mean-word-length bounds are
# the published ones scaled to this corpus's 10-99-word documents).
_G_MIN_WORDS, _G_MAX_WORDS = 20, 90
_G_MIN_MWL100, _G_MAX_MWL100 = 300, 500  # mean word length in [3.00, 5.00]
_G_MAX_TOP_BP = 2000  # most frequent word must be <= 20.00% of the doc


@register(
    "gopher_quality_rules",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS nw,
                   length(replace(text, ' ', '')) AS nch,
                   CASE WHEN position(' the ' IN ' ' || text || ' ') > 0
                         AND position(' a '   IN ' ' || text || ' ') > 0
                        THEN 1 ELSE 0 END AS has_stop
            FROM documents
        ),
        inst AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS wd
            FROM documents
        ),
        tc AS (SELECT doc_id, wd, COUNT(*) AS c FROM inst GROUP BY 1, 2),
        tm AS (SELECT doc_id, MAX(c) AS topc FROM tc GROUP BY 1),
        scored AS (
            SELECT d.source,
                   CASE WHEN d.nw BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS}
                        THEN 1 ELSE 0 END AS r_len,
                   CASE WHEN d.nch * 100 // d.nw
                             BETWEEN {_G_MIN_MWL100} AND {_G_MAX_MWL100}
                        THEN 1 ELSE 0 END AS r_mwl,
                   d.has_stop AS r_stop,
                   CASE WHEN tm.topc * 10000 // d.nw <= {_G_MAX_TOP_BP}
                        THEN 1 ELSE 0 END AS r_rep
            FROM d JOIN tm ON tm.doc_id = d.doc_id
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT)    AS n_docs,
               CAST(SUM(r_len) AS BIGINT)  AS pass_wordcount,
               CAST(SUM(r_mwl) AS BIGINT)  AS pass_meanwordlen,
               CAST(SUM(r_stop) AS BIGINT) AS pass_stopwords,
               CAST(SUM(r_rep) AS BIGINT)  AS pass_repetition,
               CAST(SUM(r_len * r_mwl * r_stop * r_rep) AS BIGINT)
                                           AS n_keep,
               CAST(SUM(r_len * r_mwl * r_stop * r_rep) * 10000 // COUNT(*)
                    AS BIGINT)             AS keep_bp
        FROM scored GROUP BY source
    """,
    doc=(
        "Gopher/MassiveText quality-rule panel per source: word-count "
        "bounds, mean-word-length bounds, stopword presence ('the' "
        "and 'a'), max-single-word-share repetition gate; per-rule "
        "pass counts + all-rules keep rate in exact basis points."
    ),
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus explode (top-word share) + per-doc column exprs,
    joined on doc_id (key-local); per-source rollup is map-side
    combinable. No UDF anywhere."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    d = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("nw"),
        F.length(F.regexp_replace("text", " ", "")).alias("nch"),
        (
            (F.instr(padded, " the ") > 0) & (F.instr(padded, " a ") > 0)
        ).cast("int").alias("r_stop"),
    )
    top = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("wd"))
        .groupBy("doc_id", "wd")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("topc"))
    )
    scored = d.join(top, "doc_id").select(
        "source",
        F.col("nw").between(_G_MIN_WORDS, _G_MAX_WORDS).cast("int").alias("r_len"),
        F.expr(f"CAST(nch * 100 DIV nw BETWEEN {_G_MIN_MWL100} AND {_G_MAX_MWL100} AS INT)").alias(
            "r_mwl"
        ),
        "r_stop",
        F.expr(f"CAST(topc * 10000 DIV nw <= {_G_MAX_TOP_BP} AS INT)").alias("r_rep"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("r_len").cast("long").alias("pass_wordcount"),
        F.sum("r_mwl").cast("long").alias("pass_meanwordlen"),
        F.sum("r_stop").cast("long").alias("pass_stopwords"),
        F.sum("r_rep").cast("long").alias("pass_repetition"),
        F.sum(F.expr("r_len * r_mwl * r_stop * r_rep")).cast("long").alias("n_keep"),
        F.expr(
            "CAST(SUM(r_len * r_mwl * r_stop * r_rep) * 10000 DIV COUNT(*) AS BIGINT)"
        ).alias("keep_bp"),
    )


_MIX_BUDGET = 1_000_000  # token budget the allocation is computed for


@register(
    "mixture_temperature_weights",
    oracle=f"""
        WITH s AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ),
        w AS (
            SELECT source, n_docs, n_tokens,
                   CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS sq
            FROM s
        ),
        tot AS (
            SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
                   CAST(SUM(sq) AS BIGINT)       AS tot_sq
            FROM w
        )
        SELECT w.source,
               w.n_docs,
               w.n_tokens,
               CAST(w.n_tokens * 1000000 // t.tot_tokens AS BIGINT)
                   AS w_tau1_ppm,
               CAST(w.sq * 1000000 // t.tot_sq AS BIGINT) AS w_tau05_ppm,
               CAST({_MIX_BUDGET} * (w.sq * 1000000 // t.tot_sq) // 1000000
                    AS BIGINT) AS alloc_tokens,
               CAST(({_MIX_BUDGET} * (w.sq * 1000000 // t.tot_sq) // 1000000)
                    * 1000000 // w.n_tokens AS BIGINT) AS epochs_ppm
        FROM w CROSS JOIN tot t
    """,
    doc=(
        "Temperature-based source mixing (mT5/XLM-R): per-source "
        "sampling weights at tau=1 (proportional) and tau=0.5 (sqrt, "
        "IEEE-exact), token allocation and expected epochs at a fixed "
        "budget — all exact ppm integers."
    ),
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source aggregate (|sources| rows) + 1-row totals broadcast
    back — flat at any corpus size. SQRT is correctly-rounded IEEE in
    both engines, FLOOR lands on identical integers."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    w = s.withColumn(
        "sq", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    )
    tot = w.agg(
        F.sum("n_tokens").cast("long").alias("tot_tokens"),
        F.sum("sq").cast("long").alias("tot_sq"),
    )
    return w.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("CAST(n_tokens * 1000000 DIV tot_tokens AS BIGINT)").alias("w_tau1_ppm"),
        F.expr("CAST(sq * 1000000 DIV tot_sq AS BIGINT)").alias("w_tau05_ppm"),
        F.expr(
            f"CAST({_MIX_BUDGET} * (sq * 1000000 DIV tot_sq) DIV 1000000 AS BIGINT)"
        ).alias("alloc_tokens"),
        F.expr(
            f"CAST(({_MIX_BUDGET} * (sq * 1000000 DIV tot_sq) DIV 1000000)"
            " * 1000000 DIV n_tokens AS BIGINT)"
        ).alias("epochs_ppm"),
    )


@register(
    "ngram_entropy_profile",
    oracle=f"""
        WITH inst AS (
            SELECT source,
                   unnest(list_transform(
                       generate_series(1, length(text) - 1),
                       i -> text[i:i + 1])) AS bg
            FROM documents
        ),
        bc AS (
            SELECT source, bg, CAST(COUNT(*) AS BIGINT) AS c
            FROM inst GROUP BY 1, 2
        ),
        lq AS (
            SELECT source, c,
                   CAST(FLOOR({sql_xlog10("c")} * 1000000.0 + 0.5) AS BIGINT)
                       AS lqc
            FROM bc
        ),
        agg AS (
            SELECT source,
                   CAST(SUM(c) AS BIGINT)        AS n_bigrams,
                   CAST(COUNT(*) AS BIGINT)      AS n_distinct,
                   CAST(SUM(c * lqc) AS BIGINT)  AS wsum
            FROM lq GROUP BY source
        )
        SELECT source, n_bigrams, n_distinct,
               CAST(CAST(FLOOR({sql_xlog10("n_bigrams")} * 1000000.0 + 0.5)
                         AS BIGINT)
                    - wsum // n_bigrams AS BIGINT) AS entropy_micro_log10
        FROM agg
    """,
    doc=(
        "Per-source character-bigram entropy (the CCNet/Gopher "
        "gibberish signal): H = log10(N) - sum(c*log10(c))/N in exact "
        "micro-log10 integers via the mu-quantized xlog10."
    ),
)
def ngram_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One char-bigram explode into a (source, bigram) aggregate —
    map-side combinable, output bounded by |sources| x |alphabet|^2;
    the entropy fold runs on that bounded table. Every term is an
    integer once xlog10 is mu-quantized, so both engines agree bitwise."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    # length >= 2 guard: Spark's sequence(1, 0) yields a DESCENDING
    # [1, 0] (it infers step -1), which would emit phantom bigrams for
    # 1-char/empty texts; DuckDB's generate_series(1, 0) is empty, so
    # the filter keeps the two engines identical on degenerate docs.
    inst = docs.filter(F.length("text") >= 2).select(
        "source",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
        ).alias("bg"),
    )
    bc = inst.groupBy("source", "bg").agg(F.count(F.lit(1)).alias("c"))
    lq = bc.select(
        "source",
        "c",
        F.floor(xlog10(F.col("c")) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("lqc"),
    )
    agg = lq.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.expr("c * lqc")).cast("long").alias("wsum"),
    )
    return agg.select(
        "source",
        "n_bigrams",
        "n_distinct",
        (
            F.floor(xlog10(F.col("n_bigrams")) * F.lit(1000000.0) + F.lit(0.5)).cast(
                "long"
            )
            - F.expr("wsum DIV n_bigrams")
        )
        .cast("long")
        .alias("entropy_micro_log10"),
    )
