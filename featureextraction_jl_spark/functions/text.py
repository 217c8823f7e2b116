"""Text-analysis expression builders (task spec F6/F7/F8).

Token counting, quality scoring and language-ID as PURE JVM column
expressions (regexp/split/filter higher-order functions — no UDF, fully
inside whole-stage codegen, trivially 100-TB-scalable as narrow maps).
These are the single source of truth shared by the driver contract
(q38/q39/q40 in ``__spark_entry__.py``, DuckDB-oracled at every round)
and the corpus-curation pipeline (``jobs/curate_corpus.py``): both sides
build from the same expressions so they cannot desynchronize.

Semantics (pinned by the q38-q40 oracles):

* whitespace tokens = ``split(trim(text), '\\s+')`` — empty string
  tokenizes to one empty token (SQL split semantics), counted as such;
* word tokens = maximal ``[A-Za-z]+|[0-9]+`` runs (the BPE-ish pre-merge
  word/number pieces);
* stopword votes use tiny per-language anchor sets — a deterministic
  n-gram-free heuristic that needs no model artifact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: per-language stopword anchor sets for the langid vote (tiny on purpose:
#: the heuristic must be reproducible in ANSI SQL for the DuckDB oracle)
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "is", "to"),
    "fr": ("le", "la", "et", "de", "un"),
    "de": ("der", "die", "und", "das", "ist"),
}

#: q39 quality-signal stopword set — ONE constant consumed by both the
#: engine expression (quality_cols) and the q39 oracle SQL (round-5
#: review: the set lived as independent literals on both sides, the
#: silent-desync hazard LANG_STOPWORDS already solves for q40)
QUALITY_STOPWORDS = ("the", "and", "of", "a")


def _lower_tokens(text_col: str) -> Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def token_count_cols(text_col: str = "text") -> list[Column]:
    """``[n_ws_tokens, n_word_tokens]`` — q38's exact expressions."""
    return [
        F.size(F.split(F.trim(text_col), r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(text_col, F.lit(r"[A-Za-z]+|[0-9]+"), 0))
        .alias("n_word_tokens"),
    ]


def quality_cols(text_col: str = "text") -> list[Column]:
    """``[len, n_punct, n_digits, n_stopwords, n_tokens]`` — q39's exact
    expressions (length/punctuation/digit/stopword signals)."""
    toks = _lower_tokens(text_col)
    stop = F.size(F.filter(toks, lambda w: w.isin(*QUALITY_STOPWORDS)))
    return [
        F.length(text_col).alias("len"),
        (F.length(text_col)
         - F.length(F.regexp_replace(text_col, r"[.,!?;:]", "")))
        .alias("n_punct"),
        (F.length(text_col)
         - F.length(F.regexp_replace(text_col, r"[0-9]", "")))
        .alias("n_digits"),
        stop.alias("n_stopwords"),
        F.size(toks).alias("n_tokens"),
    ]


def langid_cols(text_col: str = "text") -> list[Column]:
    """``[votes_en, votes_fr, votes_de, lang_pred]`` — q40's exact
    stopword-vote argmax (ties break en > fr > de; zero votes ->
    'unknown')."""
    toks = _lower_tokens(text_col)
    en = F.size(F.filter(toks, lambda w: w.isin(*LANG_STOPWORDS["en"])))
    fr = F.size(F.filter(toks, lambda w: w.isin(*LANG_STOPWORDS["fr"])))
    de = F.size(F.filter(toks, lambda w: w.isin(*LANG_STOPWORDS["de"])))
    best = F.when((en >= fr) & (en >= de) & (en > 0), "en") \
        .when((fr >= de) & (fr > 0), "fr") \
        .when(de > 0, "de").otherwise("unknown")
    return [en.alias("votes_en"), fr.alias("votes_fr"),
            de.alias("votes_de"), best.alias("lang_pred")]
