"""WordPiece-style greedy subword segmentation — the longest-match-first
tokenizer family member next to BPE (operators/bpe.py trains merges; this
trains a substring VOCABULARY and applies it the way WordPiece/BERT
tokenizers segment at inference: greedy longest prefix).

TRAIN (deterministic, SQL-replayable): the corpus collapses to the
word-type relation (vocabulary-sized, the BPE argument), every substring
of length 2..MAX_PIECE of every word type is exploded with the word's
corpus count, and the vocabulary is the top-V substrings by
(weighted frequency DESC, piece ASC — the determinism knob). Single
characters are implicitly always available as fallback, so segmentation
is total without storing them.

APPLY (distributed, zero UDF): greedy longest-match-first is a
SEQUENTIAL scan per word, which is exactly what a bounded ``aggregate``
fold expresses: state = (pos, n_pieces); step k fires only when
pos == k (a piece consumed earlier skips its covered steps), and the
match is a CASE over piece lengths MAX_PIECE..2 testing literal-array
membership, else the single-char fallback. All codegen string ops —
the same no-UDF discipline as the BPE spaced-string replace.

Training is EAGER (the top-V collect is one vocabulary-sized argsort,
driver-bounded like train_kmeans's sample and bpe_train's per-round
argmax); application injects the vocab as literals into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dawis_spark.functions import text as TXT

MAX_PIECE = 5


def _word_types(df: DataFrame, text_col: str) -> DataFrame:
    toks = TXT.tokens(text_col, "spark")
    return (
        df.select(F.explode(F.expr(toks)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
    )


def substring_candidates(df: DataFrame, text_col: str) -> DataFrame:
    """(piece, freq) for every substring of length 2..MAX_PIECE of every
    word type, weighted by corpus word count."""
    wt = _word_types(df, text_col)
    subs = (
        "flatten(transform(sequence(1, length(word)), "
        "i -> transform(sequence(2, {mp}), "
        "l -> case when i + l - 1 <= length(word) "
        "then substring(word, i, l) end)))".format(mp=MAX_PIECE)
    )
    return (
        wt.select("wc", F.explode(F.expr(f"filter({subs}, x -> x is not null)")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wc").cast("bigint").alias("freq"))
    )


def wordpiece_train(df: DataFrame, text_col: str, v: int = 48) -> list[tuple[str, int]]:
    """Top-``v`` pieces by (freq DESC, piece ASC) — the learned vocab."""
    rows = (
        substring_candidates(df, text_col)
        .orderBy(F.desc("freq"), F.asc("piece"))
        .limit(v)
        .collect()
    )
    return [(r["piece"], int(r["freq"])) for r in rows]


def vocab_df(df: DataFrame, text_col: str, v: int = 48) -> DataFrame:
    """The vocabulary as a relation: (rank, piece, freq).

    Top-``v`` selection FIRST (orderBy().limit() compiles to
    TakeOrderedAndProject — distributed per-partition top-k), so the
    rank-assigning window runs over a ``v``-row relation, never the
    vocabulary-sized candidate set (r11: the cm_heavy_hitters fix
    applied here)."""
    from pyspark.sql import Window

    return (
        substring_candidates(df, text_col)
        .orderBy(F.desc("freq"), F.asc("piece"))
        .limit(v)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("freq"), F.asc("piece")))
            .cast("int"),
        )
        .select("rank", "piece", "freq")
        .orderBy("rank")
    )


def segment_expr(word_ref: str, vocab: list[str]) -> str:
    """SQL expression: number of greedy longest-match pieces of
    ``word_ref`` under the literal ``vocab`` (singles as fallback)."""
    lit = "array(" + ", ".join("'" + p.replace("'", "''") + "'" for p in vocab) + ")"
    arms = []
    for l in range(MAX_PIECE, 1, -1):
        arms.append(
            f"when st.pos + {l} - 1 <= length({word_ref}) and "
            f"array_contains({lit}, substring({word_ref}, st.pos, {l})) then {l}"
        )
    step = f"case {' '.join(arms)} else 1 end"
    return (
        f"aggregate(sequence(1, length({word_ref})), "
        f"named_struct('pos', 1, 'n', cast(0 as bigint)), "
        f"(st, k) -> case when st.pos = k then "
        f"named_struct('pos', st.pos + ({step}), 'n', st.n + 1) "
        f"else st end).n"
    )


def segment_corpus(
    df: DataFrame, id_col: str, text_col: str, vocab: list[str]
) -> DataFrame:
    """(id, n_words, n_subwords) under greedy longest-match-first.

    The fold runs once per DISTINCT word type, not per occurrence —
    segmentation is a pure function of the string, and Zipf makes the
    type relation orders smaller than the token stream (the same
    argument as BPE's word-type training; measured ~6x at sf1 (14.9 s -> 2.6 s warm)
    vs the per-occurrence formulation). Occurrences then join the per-type
    subword count back on the word key — broadcast-sized for any
    realistic vocabulary."""
    toks = TXT.tokens(text_col, "spark")
    n_sub = segment_expr("word", vocab)
    words = df.select(F.col(id_col), F.explode(F.expr(toks)).alias("word"))
    per_type = (
        words.select("word")
        .distinct()
        .select("word", F.expr(n_sub).alias("ns"))
    )
    return (
        words.join(F.broadcast(per_type), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("ns").cast("bigint").alias("n_subwords"),
        )
        .orderBy(id_col)
    )


def vocab_oracle_ctes(v: int = 48) -> str:
    """DuckDB CTE chain replaying training; ends with wp_vocab(rank,
    piece, freq)."""
    toks = TXT.tokens("text", "duck")
    return f"""
wp_wt AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
  FROM (SELECT unnest({toks}) AS word FROM documents) GROUP BY word),
wp_pos AS (
  SELECT word, wc, CAST(unnest(range(1, length(word) + 1)) AS INT) AS i
  FROM wp_wt),
wp_cand AS (
  SELECT substring(word, i, CAST(s.l AS INT)) AS piece,
         CAST(SUM(wc) AS BIGINT) AS freq
  FROM wp_pos, range(2, {MAX_PIECE} + 1) s(l)
  WHERE i + s.l - 1 <= length(word)
  GROUP BY 1),
wp_vocab AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, piece ASC) AS INT) AS rank,
         piece, freq
  FROM wp_cand ORDER BY freq DESC, piece ASC LIMIT {v})"""


def segment_oracle_sql(v: int = 48) -> str:
    """Replay of train + greedy apply: (doc_id, n_words, n_subwords).

    The apply side is a RECURSIVE CTE over per-word scan states
    (word, pos, n) with the longest-match decided by LEFT JOINs against
    wp_vocab per piece length — fully relational on purpose: the first
    formulation captured the vocab as a cross-joined LIST column inside
    a list_reduce lambda, and DuckDB evaluated list_contains against it
    NON-DETERMINISTICALLY across rows (the same word segmented
    differently in different rows). Literal lists were fine, column
    lists were not; joins have no such hazard.
    """
    toks = TXT.tokens("text", "duck")
    joins = []
    arms = []
    for l in range(MAX_PIECE, 1, -1):
        joins.append(
            f"LEFT JOIN wp_vocab v{l} ON st.pos + {l} - 1 <= length(st.word) "
            f"AND v{l}.piece = substring(st.word, st.pos, {l})"
        )
        arms.append(f"WHEN v{l}.piece IS NOT NULL THEN {l}")
    step = f"CASE {' '.join(arms)} ELSE 1 END"
    return f"""
WITH RECURSIVE {vocab_oracle_ctes(v)},
words AS (
  SELECT doc_id, unnest({toks}) AS word FROM documents),
dwords AS (SELECT DISTINCT word FROM words),
st AS (
  SELECT word, 1 AS pos, CAST(0 AS BIGINT) AS n FROM dwords
  UNION ALL
  SELECT st.word, st.pos + ({step}), st.n + 1
  FROM st {' '.join(joins)}
  WHERE st.pos <= length(st.word)),
ns AS (SELECT word, MAX(n) AS ns FROM st GROUP BY word)
SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(ns.ns) AS BIGINT) AS n_subwords
FROM words w JOIN ns USING (word)
GROUP BY w.doc_id ORDER BY w.doc_id
"""
