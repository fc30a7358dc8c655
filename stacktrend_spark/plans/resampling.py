"""Data-selection RESAMPLING plans: target-aware corpus reweighting.

Three operators a 100 TB pretraining pipeline runs between curation
(plans/curation.py) and selection (plans/selection.py), modeled on the
published data-selection literature (no proprietary systems):

- ``dsir_importance_resampling`` — DSIR-style (Xie et al. 2023,
  "Data Selection for Language Models via Importance Resampling",
  arXiv:2302.03169) hashed-n-gram importance weights: estimate bucket
  unigram distributions for a TARGET slice (here: ``lang = 'en'``) and
  the RAW corpus, weight every out-of-target document by
  Σ_tokens log p_target(bucket) − log p_raw(bucket), and emit the
  top-k resampling picks. Buckets come from the engine-neutral 40-bit
  md5 hash (functions/hashing.py) so the oracle rebuilds them exactly.
- ``unigram_surprisal_filter`` — CCNet-style (Wenzek et al. 2020,
  arXiv:1911.00359) LM-perplexity gating with a corpus-trained unigram
  model: per-document mean token surprisal in exact µ·log10 units,
  bucketed into keep/review/discard tiers.
- ``tokenizer_fertility_panel`` — per-language tokenizer fertility:
  chars per whitespace token, UTF-8 octets per char, and BPE-ish
  subword pieces per whitespace token (the "fertility" metric used to
  size tokenizer vocabularies), as exact µ-ratios.

All log-scaled surfaces go through the decade-interpolated ``xlog10``
(functions/rounding.py) and integer µ-units, so both engines produce
bit-identical values — no libm in any hashed column.

Scale shape (shared by all three): ONE explode of the corpus into
token instances feeding a BOUNDED aggregate — 256 hash buckets (DSIR),
the vocabulary (surprisal; Heaps-law bounded and broadcast back), or
|languages| rows (fertility). Per-document combines are key-local on
doc_id. No join ever carries the fact table on both sides, so every
stage survives a 1000-executor 100 TB run.

Reference anchor: the reference pipeline gates documents with static
classifier thresholds (data_transformation.py dt:221-268); these
operators generalize that gate to distribution-matching selection,
which the reference does not attempt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from stacktrend_spark.functions.hashing import spark_hex40, sql_hex40
from stacktrend_spark.functions.rounding import sql_xlog10, xlog10
from stacktrend_spark.plans.registry import register
from stacktrend_spark.sources.tables import load_table

_DSIR_D = 256          # hashed feature buckets
_DSIR_TOPK = 25        # resampling picks to emit
_TARGET_LANG = "en"    # DSIR target slice


def _ilog(col: Column) -> Column:
    """floor(xlog10(max(x,1)) · 1e6) as int64 — exact µ·log10."""
    return F.floor(xlog10(F.greatest(col, F.lit(1))) * F.lit(1000000.0)).cast("long")


def _sql_ilog(expr: str) -> str:
    return f"CAST(FLOOR({sql_xlog10(f'GREATEST({expr}, 1)')} * 1000000.0) AS BIGINT)"


# ---------------------------------------------------------------------------
# DSIR importance resampling.
# p̂_target(b) = (tgt_cnt_b + 1) / (tgt_tot + D)   (Laplace smoothing)
# p̂_raw(b)    = (raw_cnt_b + 1) / (raw_tot + D)
# weight(doc) = Σ_tokens  µlog10 p̂_target(b(tok)) − µlog10 p̂_raw(b(tok))
# Probabilities are ppm-quantized through 128-bit-wide products
# (decimal(38,0) / HUGEINT) so the numerators can't overflow at any
# corpus size; ilog inputs are then bounded ≤ 10⁶.
# ---------------------------------------------------------------------------
@register(
    "dsir_importance_resampling",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, source,
                   unnest(string_split(lower(text), ' ')) AS term
            FROM documents
        ),
        bucketed AS (
            SELECT doc_id, lang, source,
                   ({sql_hex40('term')}) % {_DSIR_D} AS bucket
            FROM toks
        ),
        stats AS (
            SELECT bucket,
                   CAST(COUNT(*) AS BIGINT) AS raw_cnt,
                   CAST(COUNT(*) FILTER (lang = '{_TARGET_LANG}') AS BIGINT) AS tgt_cnt
            FROM bucketed GROUP BY 1
        ),
        tot AS (
            SELECT SUM(raw_cnt) AS raw_tot, SUM(tgt_cnt) AS tgt_tot FROM stats
        ),
        wb AS (
            SELECT bucket,
                   {_sql_ilog(f"CAST(CAST(tgt_cnt + 1 AS HUGEINT) * 1000000 // (tot.tgt_tot + {_DSIR_D}) AS BIGINT)")}
                 - {_sql_ilog(f"CAST(CAST(raw_cnt + 1 AS HUGEINT) * 1000000 // (tot.raw_tot + {_DSIR_D}) AS BIGINT)")}
                       AS w_micro
            FROM stats CROSS JOIN tot
        ),
        cand AS (
            SELECT b.doc_id, b.lang, b.source,
                   CAST(COUNT(*) AS BIGINT)            AS n_tokens,
                   CAST(SUM(wb.w_micro) AS BIGINT)     AS weight_micro
            FROM bucketed b JOIN wb USING (bucket)
            WHERE b.lang <> '{_TARGET_LANG}'
            GROUP BY 1, 2, 3
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                       ORDER BY weight_micro DESC, doc_id) AS rnk
            FROM cand
        )
        SELECT doc_id, lang, source, n_tokens, weight_micro,
               CAST(rnk AS INTEGER) AS rnk
        FROM ranked WHERE rnk <= {_DSIR_TOPK}
    """,
    doc=(
        "DSIR hashed-unigram importance resampling (target = en): "
        "per-bucket Laplace log-ratios in exact µlog10, per-doc "
        "token-weighted sum, top-25 out-of-target picks."
    ),
)
def dsir_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    )
    bucketed = toks.select(
        "doc_id", "lang", "source", (spark_hex40(F.col("term")) % _DSIR_D).alias("bucket")
    )
    # D-row aggregate: map-side combinable, output bounded by D=256
    stats = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("raw_cnt"),
        F.count_if(F.col("lang") == _TARGET_LANG).cast("long").alias("tgt_cnt"),
    )
    tot = stats.agg(
        F.sum("raw_cnt").alias("raw_tot"), F.sum("tgt_cnt").alias("tgt_tot")
    )
    dec = "decimal(38,0)"
    wb = (
        stats.join(F.broadcast(tot))
        .select(
            "bucket",
            (
                _ilog(
                    F.expr(
                        f"CAST(CAST(tgt_cnt + 1 AS {dec}) * 1000000"
                        f" DIV (tgt_tot + {_DSIR_D}) AS BIGINT)"
                    )
                )
                - _ilog(
                    F.expr(
                        f"CAST(CAST(raw_cnt + 1 AS {dec}) * 1000000"
                        f" DIV (raw_tot + {_DSIR_D}) AS BIGINT)"
                    )
                )
            ).alias("w_micro"),
        )
    )
    cand = (
        bucketed.filter(F.col("lang") != _TARGET_LANG)
        .join(F.broadcast(wb), "bucket")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("w_micro").cast("long").alias("weight_micro"),
        )
    )
    # distributed top-k (TakeOrderedAndProject — per-partition heaps,
    # no global single-partition window); the rank column is then a
    # window over the BOUNDED k-row result, safe at any corpus size
    top = cand.orderBy(F.desc("weight_micro"), F.col("doc_id")).limit(_DSIR_TOPK)
    w = W.orderBy(F.desc("weight_micro"), F.col("doc_id"))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "doc_id", "lang", "source", "n_tokens", "weight_micro", "rnk"
    )


# ---------------------------------------------------------------------------
# CCNet-style unigram-LM surprisal gate.
# surprisal(tok) = −log10 p̂(tok) = 6 − log10(p_ppm(tok)) in µ units;
# mean over the document's token instances, integer DIV. The unigram
# "model" is the corpus itself (vocabulary aggregate, broadcast back) —
# at production scale you'd train it on a held-out reference corpus;
# the plan shape is identical.
# ---------------------------------------------------------------------------
@register(
    "unigram_surprisal_filter",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(string_split(lower(text), ' ')) AS term
            FROM documents
        ),
        vocab AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY 1
        ),
        tot AS (SELECT SUM(cnt) AS n_tok FROM vocab),
        scored AS (
            SELECT term,
                   6000000 - {_sql_ilog(f"CAST(CAST(cnt AS HUGEINT) * 1000000 // tot.n_tok AS BIGINT)")}
                       AS surprisal_micro
            FROM vocab CROSS JOIN tot
        ),
        perdoc AS (
            SELECT t.doc_id, t.lang,
                   CAST(COUNT(*) AS BIGINT)                       AS n_tokens,
                   CAST(SUM(s.surprisal_micro) // COUNT(*) AS BIGINT)
                                                                  AS mean_surprisal_micro
            FROM toks t JOIN scored s USING (term)
            GROUP BY 1, 2
        )
        SELECT doc_id, lang, n_tokens, mean_surprisal_micro,
               CASE WHEN mean_surprisal_micro <= 3200000 THEN 'keep'
                    WHEN mean_surprisal_micro <= 4200000 THEN 'review'
                    ELSE 'discard' END AS ppl_tier
        FROM perdoc
    """,
    doc=(
        "Unigram-LM perplexity gate (CCNet stage): per-doc mean token "
        "surprisal in exact µlog10, keep/review/discard tiers; "
        "vocabulary aggregate broadcast back over one token explode."
    ),
)
def unigram_surprisal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("n_tok"))
    dec = "decimal(38,0)"
    scored = (
        vocab.join(F.broadcast(tot))
        .select(
            "term",
            (
                F.lit(6000000).cast("long")
                - _ilog(
                    F.expr(f"CAST(CAST(cnt AS {dec}) * 1000000 DIV n_tok AS BIGINT)")
                )
            ).alias("surprisal_micro"),
        )
    )
    perdoc = (
        toks.join(F.broadcast(scored), "term")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.expr("CAST(SUM(surprisal_micro) DIV COUNT(*) AS BIGINT)").alias(
                "mean_surprisal_micro"
            ),
        )
    )
    return perdoc.select(
        "doc_id",
        "lang",
        "n_tokens",
        "mean_surprisal_micro",
        F.when(F.col("mean_surprisal_micro") <= 3200000, "keep")
        .when(F.col("mean_surprisal_micro") <= 4200000, "review")
        .otherwise("discard")
        .alias("ppl_tier"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility panel. "Fertility" = subword pieces emitted per
# whitespace token — the metric tokenizer teams watch per language when
# sizing a BPE vocabulary (high fertility = the language is expensive
# to tokenize). Subword pieces come from the BPE-ish pre-tokenizer
# regex [A-Za-z]+|[0-9]|[^A-Za-z0-9 ] (letter runs, single digits,
# single symbols/CJK chars) — identical Java/RE2 semantics for these
# classes. One scan, |languages| output rows, map-side combinable.
# ---------------------------------------------------------------------------
_SUBWORD_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


@register(
    "tokenizer_fertility_panel",
    oracle=f"""
        WITH feat AS (
            SELECT lang,
                   CAST(length(text) AS BIGINT)                    AS n_chars,
                   CAST(strlen(text) AS BIGINT)                    AS n_octets,
                   CAST(len(string_split(text, ' ')) AS BIGINT)    AS ws_toks,
                   CAST(len(regexp_extract_all(text, '{_SUBWORD_RE}')) AS BIGINT)
                                                                   AS subword_toks
            FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT)          AS n_docs,
               CAST(SUM(n_chars) AS BIGINT)      AS n_chars,
               CAST(SUM(n_octets) AS BIGINT)     AS n_octets,
               CAST(SUM(ws_toks) AS BIGINT)      AS ws_tokens,
               CAST(SUM(subword_toks) AS BIGINT) AS subword_tokens,
               CAST(SUM(n_chars) * 1000000 // SUM(ws_toks) AS BIGINT)
                                                 AS chars_per_ws_micro,
               CAST(SUM(n_octets) * 1000000 // SUM(n_chars) AS BIGINT)
                                                 AS octets_per_char_micro,
               CAST(SUM(subword_toks) * 1000000 // SUM(ws_toks) AS BIGINT)
                                                 AS fertility_micro
        FROM feat GROUP BY lang
    """,
    doc=(
        "Per-language tokenizer fertility: chars/WS-token, UTF-8 "
        "octets/char, BPE-ish subword pieces/WS-token as exact "
        "µ-ratios — the vocabulary-sizing panel, one corpus scan."
    ),
)
def tokenizer_fertility_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feat = docs.select(
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.octet_length("text").cast("long").alias("n_octets"),
        F.size(F.split("text", " ")).cast("long").alias("ws_toks"),
        F.regexp_count("text", F.lit(_SUBWORD_RE)).cast("long").alias("subword_toks"),
    )
    return feat.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.sum("n_octets").cast("long").alias("n_octets"),
        F.sum("ws_toks").cast("long").alias("ws_tokens"),
        F.sum("subword_toks").cast("long").alias("subword_tokens"),
        F.expr("CAST(SUM(n_chars) * 1000000 DIV SUM(ws_toks) AS BIGINT)").alias(
            "chars_per_ws_micro"
        ),
        F.expr("CAST(SUM(n_octets) * 1000000 DIV SUM(n_chars) AS BIGINT)").alias(
            "octets_per_char_micro"
        ),
        F.expr("CAST(SUM(subword_toks) * 1000000 DIV SUM(ws_toks) AS BIGINT)").alias(
            "fertility_micro"
        ),
    )
