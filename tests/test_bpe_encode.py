"""BPE learn/encode invariants beyond the oracle hash-match."""

from __future__ import annotations

from pyspark.sql import functions as F

from dist_map_reduce_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()


def _reference_bpe_merge(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Textbook greedy left-to-right BPE merge on a symbol list."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_wrapped_replace_equals_textbook_merge(spark):
    """The ␟-wrapped string replace must implement exactly the greedy
    non-overlapping BPE merge — including the overlap case (aaaa with
    merge (a,a) → aa,aa) and the boundary case (symbol 'xa' followed
    by 'b' must NOT match merge (a,b))."""
    sep = "\x1f"
    cases = [
        (["a", "a", "a", "a"], ("a", "a")),
        (["a", "b", "a", "b", "a"], ("a", "b")),
        (["xa", "b", "a", "b"], ("a", "b")),
        (["h", "e", "l", "l", "o"], ("l", "l")),
        (["ab", "ab", "ab"], ("ab", "ab")),
    ]
    rows = [
        ("".join(f"{sep}{s}{sep}" for s in syms), pa, pb, syms)
        for syms, (pa, pb) in cases
    ]
    df = spark.createDataFrame(
        [(seq, pa, pb) for seq, pa, pb, _ in rows],
        "seq string, pa string, pb string",
    ).select(
        F.replace(
            F.col("seq"),
            F.concat(F.lit(sep), "pa", F.lit(sep + sep), "pb", F.lit(sep)),
            F.concat(F.lit(sep), "pa", "pb", F.lit(sep)),
        ).alias("merged")
    )
    got = [r.merged for r in df.collect()]
    for (_, _, _, syms), (pair_syms, pair), merged in zip(rows, cases, got):
        expected = _reference_bpe_merge(pair_syms, pair)
        assert merged == "".join(f"{sep}{s}{sep}" for s in expected), (
            pair_syms,
            pair,
        )


def test_merge_table_is_iterative_not_round1_histogram(spark):
    """Real BPE: at least one learned merge must have a multi-char
    side (it builds on an earlier round's output), which the
    iteration-1 pair histogram can never produce."""
    merges = registry.QUERIES["text_bpe_merge_table"](spark, SF_SMOKE).collect()
    assert len(merges) == 16
    assert {m.merge_rank for m in merges} == set(range(1, 17))
    assert any(len(m.pa) > 1 or len(m.pb) > 1 for m in merges)
    # counts are the round argmax, so non-increasing is NOT required;
    # but every count must be >= 1 and pairs must be distinct
    assert all(m.pair_count >= 1 for m in merges)
    assert len({(m.pa, m.pb) for m in merges}) == 16


def test_bpe_early_convergence_matches_oracle(spark, duck):
    """A corpus whose vocabulary fully merges before N_MERGES rounds
    (ADVICE r8, fixed r10): the engine's merge loop breaks early
    WITHOUT raising, returns exactly the merges found, and the
    unrolled oracle — whose per-round v{r} now falls back to v{r-1}
    when the round's argmax is empty — derives the identical merge
    table AND encoded vocabulary. The old code raised TypeError at
    zero merges and the old oracle emptied the vocabulary via a
    cross join with the empty argmax."""
    from dist_map_reduce_spark.functions.text_bpe_encode import (
        N_MERGES,
        _learn_from,
        _oracle_ctes,
    )

    # 4 merge rounds then convergence: ab / ␠ab / ␠c+d
    docs = spark.createDataFrame(
        [(1, "ab ab ab cd", "s")], ["doc_id", "text", "source"]
    )
    merges, vocab_enc = _learn_from(docs)
    got_merges = sorted(
        (r.merge_rank, r.pa, r.pb, r.pair_count) for r in merges.collect()
    )
    assert 0 < len(got_merges) < N_MERGES
    got_vocab = sorted((r.tok, r.c, r.n_syms) for r in vocab_enc.collect())

    duck.register("documents", docs.toPandas())
    try:
        exp_merges = sorted(
            map(
                tuple,
                duck.execute(
                    _oracle_ctes()
                    + "\n"
                    + " UNION ALL ".join(
                        f"SELECT {r} AS merge_rank, pa, pb, cnt FROM b{r}"
                        for r in range(1, N_MERGES + 1)
                    )
                ).fetchall(),
            )
        )
        exp_vocab = sorted(
            map(
                tuple,
                duck.execute(
                    _oracle_ctes()
                    + f""",
                    enc AS (SELECT tok, c,
                            len(string_split(seq[2:len(seq)-1],
                                             chr(31)||chr(31))) AS n_syms
                            FROM v{N_MERGES})
                    SELECT tok, c, n_syms FROM enc
                    """
                ).fetchall(),
            )
        )
    finally:
        duck.unregister("documents")
    assert got_merges == exp_merges
    assert got_vocab == exp_vocab

    # the degenerate zero-merge corpus: single one-symbol pre-token —
    # the loop breaks in round 1 and must return an EMPTY merge
    # table (not raise) and the unmerged vocabulary
    docs0 = spark.createDataFrame([(1, "a", "s")], ["doc_id", "text", "source"])
    merges0, vocab0 = _learn_from(docs0)
    assert merges0.count() == 0
    v0 = vocab0.collect()
    assert [(r.tok, r.n_syms) for r in v0] == [("a", 1)]


def test_encode_counts_are_consistent(spark):
    """BPE can only shrink the symbol count: per doc,
    n_bpe_tokens <= total chars and >= n_pretokens."""
    enc = registry.QUERIES["text_bpe_encode_docs"](spark, SF_SMOKE)
    bad = enc.filter(
        (F.col("n_bpe_tokens") < F.col("n_pretokens"))
        | (F.col("n_bpe_tokens") <= 0)
    ).count()
    assert bad == 0


def test_bpe_decode_roundtrip_is_lossless(spark):
    """Decode inverts encode: concatenating every vocabulary entry's
    post-merge symbols must reproduce the pre-token byte-for-byte
    (merges only ever glue adjacent symbols, never rewrite content).
    Since documents encode via the pre-token equi-join, vocabulary-
    level losslessness extends to every encoded document."""
    from dist_map_reduce_spark.functions.text_bpe_encode import _learn

    _, vocab_enc = _learn(spark, SF_SMOKE)
    assert vocab_enc.count() > 0
    bad = vocab_enc.filter(
        (F.concat_ws("", "syms") != F.col("tok"))
        | (F.col("n_syms") <= 0)
        | F.exists("syms", lambda s: F.length(s) == 0)
    ).count()
    assert bad == 0


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Reference winnowing: md5-derived gram hashes, per-window min,
    rightmost on ties; returns the distinct (pos, fp) set."""
    import hashlib

    n = len(text) - k + 1
    hs = [
        int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(n)
    ]
    sel = set()
    for s in range(n - w + 1):
        win = hs[s : s + w]
        m = min(win)
        # rightmost occurrence of the min
        j = max(i for i, v in enumerate(win) if v == m)
        sel.add((s + j + 1, m))  # 1-based gram position
    return sel


def test_winnow_matches_python_reference_and_guarantee(spark):
    """The Spark array-expression winnowing must equal the textbook
    algorithm exactly, and two documents sharing a substring of
    length >= K+W-1 must share at least one fingerprint VALUE (the
    winnowing guarantee)."""
    from dist_map_reduce_spark.functions.text_winnow import (
        K_GRAM,
        W_WIN,
        _P32,
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog"  # 44 >= 23
    texts = [
        "AAAA " + shared + " tail one padding text",
        "completely different prefix " + shared,
        "xyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxy",  # periodic: exercises ties
        "short text here padded to be long enough for windows",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: {(v // _P32, v % _P32) for v in r.fps}
        for r in winnow_fingerprints(docs).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_winnow(t, K_GRAM, W_WIN), f"doc {i}"
    # guarantee: docs 0 and 1 share `shared` (len >= K+W-1) => at
    # least one common fingerprint VALUE
    fps0 = {fp for _, fp in got[0]}
    fps1 = {fp for _, fp in got[1]}
    assert fps0 & fps1
    # doc 2 shares nothing that long with doc 3
    fps3 = {fp for _, fp in got[3]}
    assert not ({fp for _, fp in got[2]} & fps3)


def test_winnow_match_pairs_finds_copied_passage(spark):
    """Two documents sharing a long passage must pair up via shared
    fingerprints; unrelated documents must not. The plan must stay an
    inverted-index join (no cartesian product)."""
    from dist_map_reduce_spark.functions.text_winnow import (
        winnow_match_pairs,
    )

    passage = (
        "insert this exact long copied passage that is well beyond the "
        "winnowing guarantee threshold so fingerprints must collide"
    )
    texts = [
        "doc zero leading text " + passage + " trailing words here",
        passage + " with a totally different continuation afterwards",
        "unrelated content about something else entirely, long enough "
        "to produce plenty of fingerprints of its own for the test",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = winnow_match_pairs(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = {(r.doc_a, r.doc_b): r.n_shared_fps for r in out.collect()}
    assert (0, 1) in got and got[(0, 1)] >= 2
    assert not any(2 in pair for pair in got)


def test_winnow_short_docs_emit_no_rows(spark):
    """Documents below the K+W-1 window threshold produce no
    fingerprint row; at/above the threshold exactly one window."""
    from dist_map_reduce_spark.functions.text_winnow import (
        K_GRAM,
        W_WIN,
        winnow_fingerprints,
    )

    thr = K_GRAM + W_WIN - 1
    docs = spark.createDataFrame(
        [(0, "x" * (thr - 1)), (1, "y" * thr)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in winnow_fingerprints(docs).collect()}
    assert 0 not in rows
    assert rows[1].n_grams == thr - K_GRAM + 1 == W_WIN
    assert len(rows[1].fps) == 1  # one window, one selection


def test_winnow_decontaminate_flags_quoted_eval_passage(spark):
    """A train doc quoting an eval passage (>= K+W-1 chars) is
    flagged; clean train docs are not; no cartesian in the plan."""
    from dist_map_reduce_spark.functions.text_winnow import (
        winnow_decontaminate,
    )

    passage = (
        "this benchmark prompt sentence is long enough to guarantee a "
        "winnowing fingerprint is shared when quoted verbatim"
    )
    train = spark.createDataFrame(
        [
            (0, "innocuous training text with plenty of original words "
                "to fingerprint against the evaluation corpus"),
            (1, "contaminated document that quotes " + passage + " inline"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "eval item: " + passage)], "doc_id long, text string"
    )
    out = winnow_decontaminate(train, ev)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = {r.doc_id: r for r in out.collect()}
    assert 1 in rows and rows[1].n_eval_hits == 1
    assert 0 not in rows
