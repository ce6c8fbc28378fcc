"""Text analysis operators (training-data quality pipeline).

All pure Catalyst column expressions — every metric has an exact ANSI-SQL
mirror for the DuckDB oracle (see ``__spark_entry__``): token counting,
quality scoring (length / punctuation / stopword ratios), n-gram language
scoring, and document fingerprinting (md5 of normalized text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "by", "at", "this", "that", "be", "are",
]

PUNCT_CLASS = r"[^.,;:!?]"


def normalize(col):
    return F.regexp_replace(F.lower(col), r"\s+", " ")


def tokens(col):
    return F.split(F.trim(normalize(col)), " ")


def text_stats(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-doc metrics: n_tokens, n_chars, punct_ratio, stopword_ratio,
    uniq_ratio, quality_score.  All JVM-side expressions."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(toks),
                          F.array(*[F.lit(s) for s in STOPWORDS_EN])))
    uniq = F.size(F.array_distinct(toks))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits.cast("double") / F.greatest(uniq, F.lit(1))
    uniq_ratio = uniq.cast("double") / F.greatest(n_tokens, F.lit(1))
    quality = (
        F.lit(0.4) * F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * stop_ratio
        + F.lit(0.3) * uniq_ratio
        - F.lit(0.5) * punct_ratio
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(quality, 6).alias("quality_score"),
    )


def text_stats_oracle_sql(table: str = "documents", text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """DuckDB SQL computing exactly :func:`text_stats`."""
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    norm = f"regexp_replace(lower({text_col}), '\\s+', ' ', 'g')"
    toks = f"string_split(trim({norm}), ' ')"
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         len({toks}) AS n_tokens,
         length({text_col}) AS n_chars,
         length(regexp_replace({text_col}, '{PUNCT_CLASS}', '', 'g')) AS n_punct,
         len(list_intersect(list_distinct({toks}), [{stop_list}])) AS stop_hits,
         len(list_distinct({toks})) AS uniq
  FROM {table}
)
SELECT doc_id,
       n_tokens,
       n_chars,
       round(CAST(n_punct AS double) / greatest(n_chars, 1), 6) AS punct_ratio,
       round(CAST(stop_hits AS double) / greatest(uniq, 1), 6) AS stopword_ratio,
       round(CAST(uniq AS double) / greatest(n_tokens, 1), 6) AS uniq_ratio,
       round(0.4 * least(CAST(n_tokens AS double) / 100.0, 1.0)
             + 0.3 * (CAST(stop_hits AS double) / greatest(uniq, 1))
             + 0.3 * (CAST(uniq AS double) / greatest(n_tokens, 1))
             - 0.5 * (CAST(n_punct AS double) / greatest(n_chars, 1)),
             6) AS quality_score
FROM base
"""


LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


def lang_scores(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """n-gram-heuristic language ID: per-language marker-word hit counts
    and the argmax prediction (ties -> lexicographic, deterministic).
    Output: (doc_id, en_hits, es_hits, fr_hits, de_hits, lang_pred)."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    hits = {
        lang: F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*hits.values())
    pred = F.when(best == F.lit(0), F.lit("und"))
    for lang in sorted(LANG_MARKERS):
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[hits[lang].alias(f"{lang}_hits") for lang in LANG_MARKERS],
        pred.alias("lang_pred"),
    )


def lang_scores_oracle_sql(table: str = "documents", text_col: str = "text",
                           id_col: str = "doc_id") -> str:
    norm = f"regexp_replace(lower({text_col}), '\\s+', ' ', 'g')"
    toks = f"list_distinct(string_split(trim({norm}), ' '))"
    hits_sql = {
        lang: (
            f"len(list_intersect({toks}, "
            f"[{', '.join(repr(w) for w in words)}]))"
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(
        f"{lang}_hits" for lang in LANG_MARKERS) + ")"
    pred_cases = " ".join(
        f"WHEN {lang}_hits = {best} THEN '{lang}'"
        for lang in sorted(LANG_MARKERS)
    )
    hit_cols = ",\n         ".join(
        f"{expr} AS {lang}_hits" for lang, expr in hits_sql.items())
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         {hit_cols}
  FROM {table}
)
SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
       CASE WHEN {best} = 0 THEN 'und' {pred_cases} END AS lang_pred
FROM base
"""


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of normalized text + first-8-hex-digit
    int bucket (both engines compute identical md5 hex)."""
    norm = normalize(F.col(text_col))
    h = F.md5(norm)
    return df.select(
        F.col(id_col).alias("doc_id"),
        h.alias("fp"),
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("fp_bucket"),
    )


# GPT-2-style pre-tokenizer pattern, restricted to the regex subset both
# Java (Spark) and RE2 (DuckDB) implement identically: contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs.
# (The original GPT-2 pattern's whitespace alternatives `\s+(?!\S)|\s+`
# are dropped — RE2 has no lookahead, and for COUNTING, whitespace
# between tokens is simply unmatched text the scan skips; a leading
# space still attaches to the following token via ` ?`, matching GPT-2's
# dominant tokenization.)
BPE_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\s\p{L}\p{N}]+"
)


def bpe_token_count(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """BPE-ish token count per document: the GPT-2 pre-tokenizer split
    (what a byte-pair encoder runs before merges), counted JVM-side with
    ``regexp_count`` — the standard "how many tokens will this cost"
    estimator a training pipeline runs over every document — plus a
    chars-per-token ratio as the compression signal (whitespace between
    tokens is unmatched text the scan skips, see BPE_PRETOKEN_RE).
    Output: (doc_id, n_pretokens, n_chars, chars_per_token)."""
    n_tok = F.regexp_count(F.col(text_col),
                           F.lit(BPE_PRETOKEN_RE)).cast("long")
    n_chars = F.length(text_col).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_pretokens"),
        n_chars.alias("n_chars"),
        F.round(n_chars.cast("double")
                / F.greatest(n_tok, F.lit(1)).cast("double"), 6)
        .alias("chars_per_token"),
    )


def bpe_token_count_oracle_sql(table: str = "documents",
                               text_col: str = "text",
                               id_col: str = "doc_id") -> str:
    """DuckDB twin — identical pattern (RE2 \\p{L}/\\p{N} classes match
    Java's for the BMP text in the corpus)."""
    pat = BPE_PRETOKEN_RE.replace("'", "''")
    return f"""
WITH c AS (
  SELECT {id_col} AS doc_id,
         len(regexp_extract_all({text_col}, '{pat}')) AS n_tok,
         length({text_col}) AS n_chars
  FROM {table}
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_pretokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       round(CAST(n_chars AS double)
             / greatest(n_tok, 1), 6) AS chars_per_token
FROM c
"""
