"""BPE merge learning + corpus encoding — the tokenizer arm applied.

``text_bpe.py`` stops at the statistics of BPE training (pre-token
counts, iteration-1 pair frequencies). This module runs the actual
loop every training pipeline runs (Sennrich et al. 2016, alg. 1):

1. LEARN — N_MERGES rounds of (count adjacent symbol pairs over the
   pre-token vocabulary, take the argmax, merge it everywhere);
2. ENCODE — apply the learned merge table to the corpus and re-derive
   token counts from REAL BPE tokens instead of whitespace tokens.

Scale shape (the production BPE-trainer trick): both phases run over
the (pre-token, count) VOCABULARY, never the corpus. The corpus is
touched exactly twice — once to build the weighted vocabulary (one
shuffle whose row count is the number of DISTINCT pre-tokens,
corpus-size-independent by Zipf), once to join each document's
pre-tokens back against the encoded vocabulary (an equi-join on the
pre-token string). Every learning round is two bounded Spark jobs
(pair aggregation + 1-row argmax) over the checkpointed vocab table;
the merge application is a single JVM ``replace`` expression — no
Python anywhere.

Symbol sequences are represented as strings with every symbol wrapped
in \\x1f separators ("␟h␟␟i␟"), so applying merge (a, b) is the
literal string replace ␟a␟␟b␟ → ␟ab␟ — exact (a symbol can never
false-match across a boundary) and left-to-right greedy with
non-overlapping occurrences in BOTH engines, which is precisely BPE's
merge semantics (this is Sennrich's own space-joined-string
implementation, made collision-proof). Argmax ties break on
(pair_count DESC, pa ASC, pb ASC); string order is binary UTF-8 in
Spark (UTF8_BINARY collation) and DuckDB alike, so the learned table
is bit-identical across engines — the oracle re-learns all
N_MERGES rounds as unrolled MATERIALIZED CTEs and value-hash-matches.

Reference parity anchor: the tokenize flat-map
(/root/reference/src/worker/worker.go:270-283), generalized from a
non-letter split to a trained sub-word vocabulary.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_map_reduce_spark.catalog import load_table
from dist_map_reduce_spark.functions.text_bpe import (
    _SQL_PATTERN,
    PRETOKEN_PATTERN,
)
from dist_map_reduce_spark.registry import query
from dist_map_reduce_spark.session import iter_checkpoint

N_MERGES = 16
_SEP = "\x1f"  # unit separator: never appears in document text
_DSEP = _SEP + _SEP


def _pair_counts(state: DataFrame) -> DataFrame:
    """(pa, pb, cnt): adjacent-symbol pair frequencies over the
    wrapped-sequence vocabulary, weighted by pre-token count."""
    inner = F.expr("substring(seq, 2, length(seq) - 2)")
    syms = F.split(inner, _DSEP)
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("pa"),
                F.element_at(syms, i + 1).alias("pb"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pa:string,pb:string>>"))
    return (
        state.select(F.explode(pairs).alias("p"), "c")
        .select("p.pa", "p.pb", "c")
        .groupBy("pa", "pb")
        .agg(F.sum("c").alias("cnt"))
    )


def _learn(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Run the N_MERGES-round learning loop once per fixture dir.

    Returns ``(merges, vocab_enc)``: the (merge_rank, pa, pb,
    pair_count) table and the encoded vocabulary (tok, c, syms,
    n_syms).
    Both are persist_tracked — the loop runs Spark jobs at
    plan-construction time (each round is checkpointed so plans stay
    shallow and nothing is recomputed), so output-level persist alone
    could not skip the rebuild on a second query."""
    from dist_map_reduce_spark import caching

    hit_m = caching.peek("bpe_merges", sf_dir, session=spark)
    hit_v = caching.peek("bpe_vocab_enc", sf_dir, session=spark)
    if hit_m is not None and hit_v is not None:
        return hit_m, hit_v

    merges, vocab_enc = _learn_from(load_table(spark, sf_dir, "documents"))
    return (
        caching.persist_tracked(merges, "bpe_merges", sf_dir),
        caching.persist_tracked(vocab_enc, "bpe_vocab_enc", sf_dir),
    )


def _learn_from(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The learning loop over an arbitrary documents frame —
    ``_learn`` adds the per-fixture caching. On a corpus whose
    vocabulary fully merges before N_MERGES rounds the loop breaks
    early and returns the merges found so far (possibly zero —
    crafted-corpus tests hit this; never at corpus scale). The
    unrolled oracle mirrors this exactly: its per-round merge CTE
    falls back to the previous vocabulary when the round's argmax is
    empty (ADVICE r8, fixed r10 — the old code raised TypeError on
    zero merges and the old oracle emptied v{{r}} via a cross join
    with the empty argmax)."""
    toks = F.explode(
        F.regexp_extract_all("text", F.lit(PRETOKEN_PATTERN), F.lit(0))
    ).alias("tok")
    state = iter_checkpoint(
        docs.select(toks)
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .select(
            "tok",
            "c",
            F.regexp_replace(
                "tok", F.lit("(?s)(.)"), F.lit(f"{_SEP}$1{_SEP}")
            ).alias("seq"),
        )
    )
    bests: list[DataFrame] = []
    for r in range(1, N_MERGES + 1):
        best = iter_checkpoint(
            _pair_counts(state)
            .orderBy(F.desc("cnt"), F.asc("pa"), F.asc("pb"))
            .limit(1)
        )
        if best.count() == 0:
            break  # vocabulary fully merged (never at corpus scale)
        bests.append(best.select(F.lit(r).alias("merge_rank"), "pa", "pb", "cnt"))
        state = iter_checkpoint(
            state.crossJoin(F.broadcast(best)).select(
                "tok",
                "c",
                F.replace(
                    F.col("seq"),
                    F.concat(
                        F.lit(_SEP), F.col("pa"), F.lit(_DSEP), F.col("pb"), F.lit(_SEP)
                    ),
                    F.concat(F.lit(_SEP), F.col("pa"), F.col("pb"), F.lit(_SEP)),
                ).alias("seq"),
            )
        )
    if bests:
        merges = reduce(DataFrame.unionAll, bests).select(
            "merge_rank", "pa", "pb", F.col("cnt").alias("pair_count")
        )
    else:
        # every pre-token is a single symbol: zero merge rounds ran
        merges = docs.sparkSession.createDataFrame(
            [], "merge_rank int, pa string, pb string, pair_count bigint"
        )
    syms = F.split(F.expr("substring(seq, 2, length(seq) - 2)"), _DSEP)
    vocab_enc = state.select(
        "tok",
        "c",
        syms.alias("syms"),
        F.size(syms).alias("n_syms"),
    )
    return merges, vocab_enc


def _oracle_ctes() -> str:
    """The learning loop unrolled as DuckDB CTEs. Multi-referenced
    CTEs are MATERIALIZED — the v{r-1} chain is referenced twice per
    round, so default inlining would expand the plan 2^N_MERGES-fold
    (and reopen the parquet per expansion)."""
    sep = "chr(31)"
    dsep = f"({sep} || {sep})"
    ctes = [
        f"toks AS (SELECT unnest(regexp_extract_all(text, '{_SQL_PATTERN}')) AS tok FROM documents)",
        f"""v0 AS MATERIALIZED (
          SELECT tok, count(*) AS c,
                 regexp_replace(tok, '(?s)(.)', {sep} || '\\1' || {sep}, 'g') AS seq
          FROM toks GROUP BY tok)""",
    ]
    for r in range(1, N_MERGES + 1):
        ctes.append(f"""p{r} AS (
          SELECT syms[i] AS pa, syms[i+1] AS pb, CAST(sum(c) AS BIGINT) AS cnt
          FROM (SELECT c, string_split(seq[2:len(seq)-1], {dsep}) AS syms
                FROM v{r - 1}),
               LATERAL (SELECT unnest(generate_series(1, len(syms)-1)) AS i) t
          GROUP BY pa, pb)""")
        ctes.append(
            f"b{r} AS MATERIALIZED (SELECT pa, pb, cnt FROM p{r} "
            f"ORDER BY cnt DESC, pa ASC, pb ASC LIMIT 1)"
        )
        # LEFT JOIN ON TRUE, not a cross join: when the corpus fully
        # merges before round r, b{r} is empty and v{r} must FALL
        # BACK to v{r-1} (a cross join with the empty argmax would
        # empty the vocabulary) — mirrors the engine's early break
        ctes.append(f"""v{r} AS MATERIALIZED (
          SELECT tok, c,
                 CASE WHEN b.pa IS NULL THEN seq
                      ELSE replace(seq, {sep}||b.pa||{sep}||{sep}||b.pb||{sep},
                                   {sep}||b.pa||b.pb||{sep}) END AS seq
          FROM v{r - 1} LEFT JOIN b{r} b ON TRUE)""")
    return "WITH " + ",\n".join(ctes)


_ENC_CTES = f""",
    enc AS (SELECT tok, c,
                   len(string_split(seq[2:len(seq)-1], chr(31)||chr(31))) AS n_syms
            FROM v{N_MERGES}),
    docpre AS (
      SELECT doc_id, source,
             unnest(regexp_extract_all(text, '{_SQL_PATTERN}')) AS tok
      FROM documents
    )"""


@query(
    "text_bpe_merge_table",
    oracle=_oracle_ctes()
    + "\n"
    + " UNION ALL ".join(
        f"SELECT {r} AS merge_rank, pa, pb, cnt AS pair_count FROM b{r}"
        for r in range(1, N_MERGES + 1)
    ),
)
def text_bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table: N_MERGES ranked merges, each the
    corpus-wide argmax pair of its round (count desc, pair asc
    tie-break). Later merges build on earlier ones — e.g. round 6
    merging 'm'+'er' only exists because round 2 merged 'e'+'r' —
    which is what distinguishes real BPE from the iteration-1 pair
    histogram in ``text_bpe_merge_pairs``."""
    merges, _ = _learn(spark, sf_dir)
    return merges


@query(
    "text_bpe_encode_docs",
    oracle=_oracle_ctes()
    + _ENC_CTES
    + """
    SELECT d.doc_id,
           count(*) AS n_pretokens,
           CAST(sum(e.n_syms) AS BIGINT) AS n_bpe_tokens
    FROM docpre d JOIN enc e USING (tok)
    GROUP BY d.doc_id
    """,
)
def text_bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the learned merge table: per-doc
    pre-token count and REAL BPE token count (the sum of each
    pre-token's post-merge symbol count). The merge loop ran over the
    vocabulary; encoding the corpus is one explode + equi-join against
    the encoded vocabulary + per-doc aggregation — the join key is the
    pre-token string, Zipf-skewed, which AQE's skew-join handles (hot
    pre-tokens like ' the' are exactly the skewed-key case)."""
    _, vocab_enc = _learn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.explode(
        F.regexp_extract_all("text", F.lit(PRETOKEN_PATTERN), F.lit(0))
    ).alias("tok")
    return (
        docs.select("doc_id", toks)
        .join(vocab_enc.select("tok", "n_syms"), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_pretokens"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
    )


@query(
    "text_bpe_token_stats",
    oracle=_oracle_ctes()
    + _ENC_CTES
    + """
    SELECT d.source,
           count(DISTINCT d.doc_id) AS n_docs,
           count(*) AS total_pretokens,
           CAST(sum(e.n_syms) AS BIGINT) AS total_bpe_tokens
    FROM docpre d JOIN enc e USING (tok)
    GROUP BY d.source
    """,
)
def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus token budget measured in REAL BPE tokens —
    the number a training-data pipeline actually meters cost and
    mixing weights with (supersedes the whitespace-token counts of
    ``text_token_counts`` for that purpose)."""
    _, vocab_enc = _learn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.explode(
        F.regexp_extract_all("text", F.lit(PRETOKEN_PATTERN), F.lit(0))
    ).alias("tok")
    return (
        docs.select("doc_id", "source", toks)
        .join(vocab_enc.select("tok", "n_syms"), "tok")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("total_pretokens"),
            F.sum("n_syms").alias("total_bpe_tokens"),
        )
    )


@query(
    "text_bpe_token_ids_fingerprint",
    oracle=_oracle_ctes()
    + f""",
    vsyms AS (SELECT tok, string_split(seq[2:len(seq)-1],
                                       chr(31)||chr(31)) AS syms
              FROM v{N_MERGES}),
    alpha AS (SELECT DISTINCT unnest(syms) AS sym FROM vsyms),
    ids AS (SELECT sym, row_number() OVER (ORDER BY sym) AS sym_id
            FROM alpha),
    docpre2 AS (
      SELECT doc_id, i AS pos, toks[i] AS tok
      FROM (SELECT doc_id,
                   regexp_extract_all(text, '{_SQL_PATTERN}') AS toks
            FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) t
    ),
    symrows AS (
      SELECT d.doc_id, d.pos, j AS spos, v.syms[j] AS sym
      FROM docpre2 d JOIN vsyms v USING (tok),
           LATERAL (SELECT unnest(generate_series(1, len(v.syms))) AS j) tt
    )
    SELECT s.doc_id,
           count(*) AS n_bpe_tokens,
           md5(string_agg(CAST(i.sym_id AS VARCHAR), ','
                          ORDER BY s.pos, s.spos)) AS token_ids_md5
    FROM symrows s JOIN ids i USING (sym)
    GROUP BY s.doc_id
    """,
)
def text_bpe_token_ids_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full encoded corpus, checked token-by-token: every
    document's complete BPE token-ID sequence (vocabulary ids =
    dense numbering of the post-merge symbol alphabet in binary-UTF8
    order, identical in both engines) collapsed to an md5
    fingerprint — so a single transposed, dropped, or misidentified
    token ANYWHERE in the corpus hash-mismatches, not just the
    counts. This is the artifact a training pipeline actually ships
    (token-id sequences), fingerprinted because the harness compares
    scalar columns.

    Scale shape: pre-token explode (position-keeping) → equi-join on
    the encoded vocabulary → symbol explode → broadcast join against
    the alphabet-bounded id table → one per-doc ordered aggregation.
    All joins are equi-joins; the id table is alphabet-sized (initial
    characters + N_MERGES merged symbols) and broadcasts at any
    corpus size."""
    from pyspark.sql import Window as W

    _, vocab_enc = _learn(spark, sf_dir)
    # dense vocabulary ids over the bounded post-merge alphabet; the
    # single-partition window is fine BECAUSE the alphabet is bounded
    # (chars + N_MERGES), never corpus-sized
    sym_ids = (
        vocab_enc.select(F.explode("syms").alias("sym"))
        .distinct()
        .select("sym", F.row_number().over(W.orderBy("sym")).alias("sym_id"))
    )
    docs = load_table(spark, sf_dir, "documents")
    docpre = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all("text", F.lit(PRETOKEN_PATTERN), F.lit(0))
        ).alias("pos", "tok"),
    )
    sym_rows = docpre.join(vocab_enc.select("tok", "syms"), "tok").select(
        "doc_id", "pos", F.posexplode("syms").alias("spos", "sym")
    )
    return (
        sym_rows.join(F.broadcast(sym_ids), "sym")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bpe_tokens"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "spos", "sym_id"))
                        ),
                        lambda s: s.sym_id.cast("string"),
                    ),
                )
            ).alias("token_ids_md5"),
        )
    )
